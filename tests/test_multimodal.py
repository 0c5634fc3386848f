"""X5 multimodal plumbing invariants.

The decode/resize/frame-sample stages run Python only inside
Arrow-batched ``mapInPandas`` (the bytes never reach the driver), and
each stage's *deterministic* parts are pinned here; the frame sampler
is additionally hash-verified against a DuckDB oracle through the
registry replay in test_correctness.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark import registry
from severless_data_pipeline_aws_spark.operators import multimodal

SPECS = registry.load_all()


def test_decode_parses_every_header(spark, sf_dir):
    out = SPECS["multimodal_decode_features"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "decode produced no rows"
    assert all(r["header_ok"] for r in rows)
    # body = 16 md5 bytes after the 12-byte header
    assert all(r["n_bytes"] == 28 for r in rows)
    assert all(0.0 <= r["mean_byte"] <= 255.0 for r in rows)


def test_resize_rewrites_header_preserves_body(spark, sf_dir):
    src = multimodal.synthesize_media(spark, sf_dir)
    dst = SPECS["multimodal_resize_stub"].fn(spark, sf_dir)
    src_bodies = {r["doc_id"]: bytes(r["payload"])[12:] for r in src.collect()}
    rows = dst.collect()
    assert len(rows) == len(src_bodies)
    for r in rows:
        b = bytes(r["payload"])
        assert (r["dst_w"], r["dst_h"]) == (32, 32)
        assert b[:4] == b"IMG1"
        assert int.from_bytes(b[4:8], "big") == 32
        assert b[12:] == src_bodies[r["doc_id"]], "resize must not touch the body"


def test_frame_sample_stride_and_count(spark, sf_dir):
    vids = {
        r["doc_id"]: r["n_frames"]
        for r in multimodal.synthesize_video(spark, sf_dir).collect()
    }
    frames = SPECS["multimodal_frame_sample"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_index"])
    for doc_id, nf in vids.items():
        expect = list(range(0, nf, 2))
        assert sorted(by_doc.get(doc_id, [])) == expect


def test_cdc_chunks_reassemble_and_dedup(spark, sf_dir):
    """Chunks tile each payload exactly (contiguous, full coverage) and
    identical payloads produce identical chunk hash sequences."""
    from severless_data_pipeline_aws_spark.registry import load_all

    rows = load_all()["multimodal_cdc_chunks"].fn(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 100
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        pos = 0
        for c in chunks:
            assert c["offset"] == pos
            assert c["length"] > 0
            pos += c["length"]
        assert pos == 512  # 32 md5 digests x 16 bytes each


def test_cdc_shift_resistance():
    """Inserting bytes at the front must leave MOST chunk hashes intact
    (boundaries resynchronize) — the property fixed-size chunking lacks."""
    import hashlib

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        cdc_chunk_bytes,
    )

    base = b"".join(
        hashlib.md5(f"payload{i}".encode()).digest() for i in range(64)
    )  # 1 KiB varied
    shifted = b"XYZ" + base
    h_base = {h for _, _, h in cdc_chunk_bytes(base)}
    h_shift = {h for _, _, h in cdc_chunk_bytes(shifted)}
    shared = len(h_base & h_shift) / len(h_base)
    assert shared >= 0.8, f"only {shared:.0%} of chunks survived a 3-byte insert"
    # determinism
    assert cdc_chunk_bytes(base) == cdc_chunk_bytes(base)


# -- real-pixel BMP tier (r4) -------------------------------------------------


def test_bmp_payloads_are_valid_and_resize_is_block_mean(spark, sf_dir):
    from severless_data_pipeline_aws_spark.operators.multimodal import (
        bmp_box_resize2x,
        bmp_decode,
        synthesize_bmp_media,
    )

    rows = synthesize_bmp_media(spark, sf_dir, limit=25).collect()
    assert rows
    for r in rows:
        img = bmp_decode(bytes(r.payload))  # raises on any malformed byte
        assert img.shape == (8, 8, 3)
        small = bmp_box_resize2x(img)
        # independent block-mean check on one corner block
        blk = img[0:2, 0:2, 0]
        assert small[0, 0, 0] == int(blk.sum()) // 4


def test_bmp_resize_query_round_trips(spark, sf_dir):
    from severless_data_pipeline_aws_spark import registry

    df = registry.load_all()["multimodal_bmp_resize_box"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r.out_valid for r in rows)
    assert all(r.dst_w == 4 and r.dst_h == 4 for r in rows)
    assert all(0 <= r.checksum <= 4 * 4 * 3 * 255 for r in rows)


def test_bmp_decoder_matches_pil_box_filter(spark, sf_dir):
    """Cross-check the pure decoder + box resize against PIL where it
    exists (skips loudly in this container — no PIL installable)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        bmp_box_resize2x,
        bmp_decode,
        synthesize_bmp_media,
    )

    for r in synthesize_bmp_media(spark, sf_dir, limit=10).collect():
        ours = bmp_box_resize2x(bmp_decode(bytes(r.payload)))
        pil = Image.open(io.BytesIO(bytes(r.payload))).resize((4, 4), Image.BOX)
        # PIL BOX uses float accumulation + rounding; floor-mean may
        # differ by at most 1 count per channel
        assert np.abs(np.asarray(pil).astype(int) - ours.astype(int)).max() <= 1


def test_png_payloads_are_byte_valid_with_independent_crc(spark, sf_dir):
    """The synthesized PNGs must be REAL PNG bytes: signature, IHDR
    length, and — validated with Python's zlib.crc32, independent of
    Spark's crc32() — the stored chunk CRC. A drift in either engine's
    CRC or in the byte layout fails here, not just at the oracle."""
    import struct
    import zlib

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        synthesize_png_media,
    )

    rows = synthesize_png_media(spark, sf_dir, 20).collect()
    assert len(rows) == 20
    for r in rows:
        p = bytes(r["payload"])
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        assert struct.unpack(">I", p[8:12])[0] == 13
        chunk = p[12:29]  # type (4) + IHDR data (13)
        stored = struct.unpack(">I", p[29:33])[0]
        assert zlib.crc32(chunk) & 0xFFFFFFFF == stored
        assert p[33:] == b"\x00\x00\x00\x00IEND\xaeB`\x82"


def test_crc_family_check_vectors_and_table_disjointness():
    """The catalogue check vectors (RevEng CRC catalogue, public):
    CRC-32/ISO-HDLC('123456789') = 0xCBF43926 and
    CRC-32C/Castagnoli('123456789') = 0xE3069283 — pinned against a
    pure-Python replay of the SAME literal tables the Spark/DuckDB
    folds embed; plus zlib's independent implementation for the gzip
    family, and pairwise table disjointness beyond the shared [0]=0."""
    import zlib

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        _CRC32_TABLE,
        _CRC32C_TABLE,
        _OGG_CRC_TABLE,
    )

    def fold_reflected(table, data: bytes) -> int:
        c = 0xFFFFFFFF
        for b in data:
            c = (c >> 8) ^ table[(c ^ b) & 0xFF]
        return c ^ 0xFFFFFFFF

    data = b"123456789"
    assert fold_reflected(_CRC32_TABLE, data) == 0xCBF43926
    assert fold_reflected(_CRC32_TABLE, data) == zlib.crc32(data)
    assert fold_reflected(_CRC32C_TABLE, data) == 0xE3069283

    # the three 256-entry tables agree ONLY at index 0 (= 0): truly
    # distinct polynomial families, not re-parameterizations
    for ta, tb in [
        (_CRC32_TABLE, _CRC32C_TABLE),
        (_CRC32_TABLE, _OGG_CRC_TABLE),
        (_CRC32C_TABLE, _OGG_CRC_TABLE),
    ]:
        same = [i for i in range(256) if ta[i] == tb[i]]
        assert same == [0], same


def test_crc_masked_matches_snappy_reference():
    """The Snappy framing mask ((c >>> 15 | c << 17) + 0xa282ead8 mod
    2^32) — Python replay vs the SQL integer form used in the plan."""
    def mask_ref(c: int) -> int:
        return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF

    def mask_sql(c: int) -> int:
        return ((c // 32768) + ((c * 131072) % 4294967296)
                + 0xA282EAD8) % 4294967296

    for c in [0, 1, 0xE3069283, 0xFFFFFFFF, 0x12345678, 0xDEADBEEF]:
        assert mask_sql(c) == mask_ref(c), hex(c)


def test_snappy_frame_bytes_match_python_construction(spark, sf_dir):
    """The synthesized Snappy framing stream must be byte-identical to
    an independent pure-Python construction of the spec layout (stream
    id chunk + two uncompressed chunks with masked CRC-32C) — the
    genuine-bytes pin for X5ac."""
    import hashlib
    import struct

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        _CRC32C_TABLE,
        synthesize_snappy_media,
    )

    def crc32c(data: bytes) -> int:
        c = 0xFFFFFFFF
        for byte in data:
            c = (c >> 8) ^ _CRC32C_TABLE[(c ^ byte) & 0xFF]
        return c ^ 0xFFFFFFFF

    def mask(c: int) -> int:
        return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF

    rows = (
        synthesize_snappy_media(spark, sf_dir, limit=8)
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            "doc_id",
        )
        .collect()
    )
    assert rows
    for r in rows:
        md5 = hashlib.md5(r.text.encode()).hexdigest()
        md5x = hashlib.md5((r.text + "x").encode()).hexdigest()
        d1 = md5[: 10 + r.doc_id % 7].encode()
        d2 = md5x[: 8 + r.doc_id % 5].encode()
        want = b"\xff\x06\x00\x00sNaPpY"
        for d in (d1, d2):
            want += (
                b"\x01"
                + struct.pack("<I", 4 + len(d))[:3]
                + struct.pack("<I", mask(crc32c(d)))
                + d
            )
        assert bytes(r.payload) == want, r.doc_id


def test_zstd_frame_bytes_match_python_construction(spark, sf_dir):
    """The synthesized zstd frame + skippable frame must be
    byte-identical to an independent pure-Python construction of the
    RFC 8878 layout — the genuine-bytes pin for X5ad."""
    import hashlib
    import struct

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        synthesize_zstd_media,
    )

    rows = (
        synthesize_zstd_media(spark, sf_dir, limit=8)
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            "doc_id",
        )
        .collect()
    )
    assert rows
    for r in rows:
        ln = 15 + r.doc_id % 11
        sk = 4 + r.doc_id % 9
        data = hashlib.md5(r.text.encode()).hexdigest()[:ln].encode()
        skip = hashlib.md5((r.text + "y").encode()).hexdigest()[:sk].encode()
        want = (
            b"\x28\xb5\x2f\xfd"
            + bytes([0x21, 1 + r.doc_id % 250, ln])
            + struct.pack("<I", 1 | (ln << 3))[:3]
            + data
            + bytes([0x50 + r.doc_id % 16])
            + b"\x2a\x4d\x18"
            + struct.pack("<I", sk)
            + skip
        )
        assert bytes(r.payload) == want, r.doc_id


def test_allen_classifier_covers_all_seven_relations(spark):
    """The shared Allen CASE must classify each of the seven relation
    classes correctly on hand-built proper intervals (the synthetic
    corpus may not exercise equals/starts/finishes — this test keeps
    the classifier non-vacuous)."""
    from severless_data_pipeline_aws_spark.operators.joins import (
        _ALLEN_CLASS,
    )

    cases = [
        (0, 10, 10, 20, "meets"),  # touch at one endpoint
        (0, 10, 0, 10, "equals"),
        (0, 5, 0, 10, "starts"),
        (3, 10, 0, 10, "finishes"),
        (2, 8, 0, 10, "during"),
        (0, 10, 2, 8, "during"),  # contains = during's inverse bucket
        (0, 6, 4, 10, "overlaps"),
    ]
    df = spark.createDataFrame(
        [(sa, ea, sb, eb, want) for sa, ea, sb, eb, want in cases],
        "sa long, ea long, sb long, eb long, want string",
    )
    got = df.selectExpr("want", f"{_ALLEN_CLASS} AS rel").collect()
    for r in got:
        assert r.rel == r.want, (r.want, r.rel)
