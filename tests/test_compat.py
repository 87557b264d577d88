"""compat.ensure_protobuf: locates a runtime, is idempotent, and makes
the pyspark transformWithState proto importable (the enabling condition
for the v2 stateful tests)."""

from __future__ import annotations

import os
import sys


def test_ensure_protobuf_locates_runtime_and_is_idempotent():
    from receiptanalyzerpipeline_spark.compat import ensure_protobuf

    assert ensure_protobuf() is True
    import google.protobuf  # noqa: F401

    path_before = os.environ.get("PYTHONPATH", "")
    sys_path_len = len(sys.path)
    assert ensure_protobuf() is True  # second call: no duplicate entries
    assert os.environ.get("PYTHONPATH", "") == path_before
    assert len(sys.path) == sys_path_len


def test_pyspark_state_proto_loads():
    from receiptanalyzerpipeline_spark.compat import ensure_protobuf

    assert ensure_protobuf()
    from pyspark.sql.streaming.proto import StateMessage_pb2 as m

    req = m.StateRequest(version=1)
    out = m.StateRequest()
    out.ParseFromString(req.SerializeToString())
    assert out.version == 1
