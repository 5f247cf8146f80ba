"""PPM parser unit coverage: the decode query's oracle only certifies
well-formed fixtures; these exercise the parser's rejection paths and
header tolerance directly."""

from __future__ import annotations

from strategy_analyzer_exporter_spark.operators.multimodal import (
    PPM_MAXV,
    make_ppm,
    parse_ppm,
)


def test_roundtrip_fixture():
    for doc_id in (0, 1, 7, 123, 4096):
        w, h, raster = parse_ppm(make_ppm(doc_id))
        assert (w, h) == (4 + doc_id % 5, 3 + doc_id % 4)
        assert len(raster) == w * h * 3
        assert raster[5] == (doc_id * 7 + 5 * 13) % 256


def test_comment_and_whitespace_tolerant_header():
    raster = bytes(range(2 * 1 * 3))
    b = b"P6 # a comment\n  2\t1 # another\n%d\n" % PPM_MAXV + raster
    assert parse_ppm(b) == (2, 1, raster)


def test_rejections():
    good = make_ppm(5)
    assert parse_ppm(b"P5" + good[2:]) is None  # wrong magic
    assert parse_ppm(good[:-1]) is None  # truncated raster
    assert parse_ppm(good + b"\x00") is None  # trailing junk
    assert parse_ppm(b"P6\n2 1\n127\n" + bytes(6)) is None  # wrong maxval
    assert parse_ppm(b"P6\nx 1\n255\n" + bytes(6)) is None  # non-numeric
    assert parse_ppm(b"P6\n0 1\n255\n") is None  # zero dim
