"""Environment shims for constrained sandboxes.

``ensure_protobuf()``: transformWithState's Python runner speaks protobuf
to the JVM state server, so it needs the ``google.protobuf`` runtime in
BOTH the driver and the Python workers. Production environments simply
install protobuf; some hermetic containers ship no pip access but DO
carry a pure-Python protobuf runtime inside another SDK's vendored tree.
This probe activates ONLY when ``import google.protobuf`` fails: it
searches a short list of well-known vendored locations, and on a hit
prepends the directory to ``sys.path`` AND ``PYTHONPATH`` (so Spark's
Python workers inherit it — set it up BEFORE creating the SparkSession)
and sets protobuf's official ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``
escape hatch, since a vendored runtime may trail the version pyspark's
gencode was built with (the StateMessage protocol itself is stable across
those minor versions).
"""

from __future__ import annotations

import os
import sys

_VENDORED_PROTOBUF_DIRS = (
    # google-cloud-sdk ships a pure-Python protobuf under the plain
    # `google.protobuf` namespace for its appengine tooling.
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible.

    Returns True when the runtime is (or becomes) importable. No-op when
    protobuf is already installed. Call before building the SparkSession
    so workers inherit PYTHONPATH.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for d in _VENDORED_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        if d not in sys.path:
            sys.path.insert(0, d)
        existing = os.environ.get("PYTHONPATH", "")
        if d not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = d + (os.pathsep + existing if existing else "")
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        try:
            import google.protobuf  # noqa: F401

            return True
        except ImportError:
            continue
    return False
