"""binaryFile media source → multimodal decode, end-to-end on REAL files
written to disk (stdlib-generated PNG/GIF/WAV): extension routing, glob
pruning, and the full source → real_decoder pipeline."""

from __future__ import annotations

import os

from datalake_ingestion_system_spark.operators import multimodal
from datalake_ingestion_system_spark.sources.binary_media import (
    media_type_for, read_media_dir)
from tests.test_multimodal import _gif_bytes, _png_bytes, _wav_bytes


def _write_files(d):
    os.makedirs(d, exist_ok=True)
    files = {
        "a.png": _png_bytes(320, 200),
        "b.gif": _gif_bytes(13, 37),
        "c.wav": _wav_bytes(2.5),
        "notes.txt": b"not media",
    }
    for name, payload in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    return files


def test_source_routes_types_and_reads_bytes(spark, tmp_path):
    d = str(tmp_path / "media")
    files = _write_files(d)
    rows = {os.path.basename(r.src_path):
            (r.media_type, r.byte_len, bytes(r.media_bytes))
            for r in read_media_dir(spark, d).collect()}
    assert rows["a.png"][0] == "image"
    assert rows["b.gif"][0] == "image"
    assert rows["c.wav"][0] == "audio"
    assert rows["notes.txt"][0] == "binary"
    for name, payload in files.items():
        assert rows[name][1] == len(payload)
        assert rows[name][2] == payload  # exact bytes round-trip


def test_glob_prunes_before_content_read(spark, tmp_path):
    d = str(tmp_path / "media")
    _write_files(d)
    got = read_media_dir(spark, d, glob="*.png").collect()
    assert len(got) == 1 and got[0].src_path.endswith("a.png")


def test_source_to_real_decoder_end_to_end(spark, tmp_path):
    d = str(tmp_path / "media")
    _write_files(d)
    media = (read_media_dir(spark, d)
             .filter(media_type_for("src_path") != "binary")
             .select("media_id", "media_type", "media_bytes"))
    out = {r.media_type: (r.width, r.height, r.duration_ms)
           for r in multimodal.decode_media(
               media, multimodal.real_decoder).collect()
           if r.media_type == "audio" or r.width == 320}
    assert out["image"] == (320, 200, 0)
    assert out["audio"] == (0, 0, 2500)
