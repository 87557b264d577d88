"""CLI entry-point tests: the reference's command surface end-to-end
(analyze, hash-image, init-db) with stub images and backend."""

from __future__ import annotations

from pathlib import Path

from receiptanalyzerpipeline_spark.cli import main
from receiptanalyzerpipeline_spark.multimodal.images import STUB_MAGIC


def _img(pixels: list[int]) -> bytes:
    return STUB_MAGIC + bytes(pixels)


def test_hash_image_and_rename(tmp_path: Path, capsys):
    f = tmp_path / "scan_001.png"
    f.write_bytes(_img([10] * 32 + [200] * 32))
    assert main(["hash-image", "--image-file", str(f), "--rename"]) == 0
    out = capsys.readouterr().out
    assert "00000000ffffffff" in out
    assert (tmp_path / "00000000ffffffff.png").exists()
    assert not f.exists()


def test_analyze_writes_curated(spark, tmp_path: Path):
    imgs = tmp_path / "in"
    imgs.mkdir()
    (imgs / "a.png").write_bytes(_img([10] * 32 + [200] * 32))
    (imgs / "b.png").write_bytes(_img([0, 255] * 32))
    work = tmp_path / "work"
    rc = main(
        ["analyze", "--image-file", str(imgs), "--work-dir", str(work), "--write"]
    )
    assert rc == 0
    summary = spark.read.parquet(str(work / "receipt_summary"))
    assert summary.count() == 2
    assert {"img_id", "vendor_name", "total", "currency", "month"} <= set(summary.columns)


def test_init_db(spark, tmp_path: Path):
    work = tmp_path / "db"
    assert main(["init-db", "--work-dir", str(work)]) == 0
    summary = spark.read.parquet(str(work / "receipt_summary"))
    assert summary.count() == 0
    assert "total" in summary.columns
