"""PPM/BMP parser unit coverage: the decode queries' oracles only
certify well-formed fixtures; these exercise the parsers' rejection
paths, header tolerance, and (BMP) orientation handling directly."""

from __future__ import annotations

import struct

from strategy_analyzer_exporter_spark.operators.multimodal import (
    BMP_HEADER_SIZE,
    PPM_MAXV,
    _bmp_px,
    _wav_sample,
    _y4m_byte,
    _y4m_geom,
    make_bmp,
    make_ppm,
    make_wav,
    make_y4m,
    parse_bmp,
    parse_ppm,
    parse_wav,
    parse_y4m,
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


# --- BMP -------------------------------------------------------------------


def test_bmp_roundtrip_matches_formula():
    """Parsed raster must be the logical TOP-DOWN RGB image — i.e. the
    parser undid bottom-up row storage, BGR order, and row padding."""
    for doc_id in (0, 1, 7, 123, 4096):
        w, h, raster = parse_bmp(make_bmp(doc_id))
        assert (w, h) == (4 + doc_id % 5, 3 + doc_id % 4)
        assert len(raster) == w * h * 3
        for i in (0, w - 1, w * h - 1):  # first row, row end, last pixel
            for c in range(3):
                assert raster[3 * i + c] == _bmp_px(doc_id, i, c)


def test_bmp_orientations_equivalent():
    """Negative-height (top-down) storage decodes to the SAME logical
    image as the default bottom-up storage."""
    for doc_id in (2, 9, 55):
        assert parse_bmp(make_bmp(doc_id)) == parse_bmp(
            make_bmp(doc_id, top_down=True)
        )


def test_bmp_rejections():
    good = make_bmp(5)
    assert parse_bmp(b"XX" + good[2:]) is None  # wrong magic
    assert parse_bmp(good[:-1]) is None  # truncated raster
    assert parse_bmp(good[:BMP_HEADER_SIZE - 1]) is None  # header only
    # 8-bpp: patch the bit-count field (offset 28, uint16)
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    assert parse_bmp(bytes(bad_bpp)) is None
    # compressed (BI_RLE8 = 1 at offset 30)
    bad_comp = bytearray(good)
    struct.pack_into("<I", bad_comp, 30, 1)
    assert parse_bmp(bytes(bad_comp)) is None
    # pixel offset pointing inside the header
    bad_off = bytearray(good)
    struct.pack_into("<I", bad_off, 10, 7)
    assert parse_bmp(bytes(bad_off)) is None


# --- WAV -------------------------------------------------------------------


def test_wav_roundtrip_matches_formula():
    """Parsed samples must be signed, interleaved, and in fixture order
    — covers both the plain layout and the odd-LIST-chunk layout
    (doc_id % 3 == 0 embeds a 7-byte chunk + pad before `data`)."""
    for doc_id in (0, 1, 7, 123, 4098):  # 0/123/4098 carry the LIST chunk
        nch, rate, samples = parse_wav(make_wav(doc_id))
        assert nch == 1 + doc_id % 2
        assert rate == 8000 + (doc_id % 4) * 4000
        nfr = 16 + doc_id % 17
        assert len(samples) == nfr * nch
        for i in (0, nfr - 1):
            for c in range(nch):
                assert samples[i * nch + c] == _wav_sample(doc_id, i, c)
    assert any(s < 0 for s in parse_wav(make_wav(1))[2])  # really signed


def test_wav_unknown_chunk_requires_pad_byte():
    """Dropping the LIST chunk's word-alignment pad byte must desync the
    chunk walk — the parser may not silently resync."""
    good = make_wav(3)  # no LIST chunk
    assert parse_wav(good) is not None
    padded = make_wav(0)  # odd-sized LIST chunk + pad byte
    assert parse_wav(padded) is not None
    i = padded.index(b"LIST")
    import struct

    size = struct.unpack_from("<I", padded, i + 4)[0]
    assert size % 2 == 1
    pad_at = i + 8 + size
    unpadded = padded[:pad_at] + padded[pad_at + 1 :]
    # fix the RIFF size so only the missing pad is wrong
    unpadded = (
        unpadded[:4]
        + struct.pack("<I", len(unpadded) - 8)
        + unpadded[8:]
    )
    assert parse_wav(unpadded) is None


def test_wav_rejections():
    import struct

    good = make_wav(5)
    assert parse_wav(b"XXXX" + good[4:]) is None  # wrong magic
    assert parse_wav(good[:-1]) is None  # truncated data chunk
    assert parse_wav(good[:11]) is None  # shorter than RIFF header
    bad_riff_size = bytearray(good)
    struct.pack_into("<I", bad_riff_size, 4, len(good))  # off by 8
    assert parse_wav(bytes(bad_riff_size)) is None
    fmt_at = good.index(b"fmt ") + 8
    non_pcm = bytearray(good)
    struct.pack_into("<H", non_pcm, fmt_at, 3)  # IEEE float format tag
    assert parse_wav(bytes(non_pcm)) is None
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, fmt_at + 14, 8)  # 8-bit samples
    assert parse_wav(bytes(bad_bits)) is None
    bad_align = bytearray(good)
    struct.pack_into("<H", bad_align, fmt_at + 12, 6)  # align != nch*2
    assert parse_wav(bytes(bad_align)) is None


# --- Y4M -------------------------------------------------------------------


def test_y4m_roundtrip_matches_formula():
    """Parsed frames must be the raw plane payloads in stream order —
    covers both bare FRAME markers and the X-param layout
    (doc_id % 3 == 0 adds header X tokens and FRAME parameters)."""
    for doc_id in (0, 1, 7, 123, 4098):  # 0/123/4098 carry X params
        w, h, frames = parse_y4m(make_y4m(doc_id))
        ew, eh, enf = _y4m_geom(doc_id)
        assert (w, h, len(frames)) == (ew, eh, enf)
        q = (w // 2) * (h // 2)
        for f in (0, enf - 1):
            fr = frames[f]
            assert len(fr) == w * h + 2 * q
            assert fr[0] == _y4m_byte(doc_id, f, 0, 0)  # Y start
            assert fr[w * h] == _y4m_byte(doc_id, f, 0, 1)  # U start
            assert fr[w * h + q] == _y4m_byte(doc_id, f, 0, 2)  # V start


def test_y4m_rejections():
    good = make_y4m(5)
    assert parse_y4m(b"JUNK" + good[4:]) is None  # wrong magic
    assert parse_y4m(good[:-1]) is None  # truncated last frame
    assert parse_y4m(good + b"FRAME\n") is None  # marker, no payload
    assert parse_y4m(good.replace(b"C420", b"C444", 1)) is None
    assert parse_y4m(good.replace(b"FRAME", b"FRAMX", 1)) is None
    # odd width rejected (4:2:0 needs even dims)
    assert parse_y4m(b"YUV4MPEG2 W3 H2 C420\n") is None
    # unknown single-letter tag rejected
    assert parse_y4m(good.replace(b" Ip ", b" Zp ", 1)) is None
    # FRAME params must be space-separated from the marker
    assert parse_y4m(make_y4m(0).replace(b"FRAME Xq=5", b"FRAMEXq=25", 1)) is None


def test_y4m_header_only_is_zero_frames():
    assert parse_y4m(b"YUV4MPEG2 W4 H2 C420\n") == (4, 2, [])


def test_y4m_zero_frame_stream_decodes_to_no_rows():
    """A legal header-only stream (zero frames) must produce zero
    sampled-frame rows — not a stride-0 range() crash in the batch."""
    import pandas as pd

    from strategy_analyzer_exporter_spark.operators.multimodal import (
        _y4m_decode_batches,
    )

    pdf = pd.DataFrame({"media_id": [1], "payload": [b"YUV4MPEG2 W4 H2 C420\n"]})
    out = list(_y4m_decode_batches(iter([pdf])))
    assert sum(len(o) for o in out) == 0


def test_wav_three_channel_sum_ch1_is_real():
    """parse_wav accepts any channel count with a coherent fmt chunk;
    the featurizer must then report channel 1's true sum, not 0."""
    import struct

    import pandas as pd

    from strategy_analyzer_exporter_spark.operators.multimodal import (
        _wav_decode_batches,
    )

    nch, nfr = 3, 4
    samples = [(10 * i + c) - 15 for i in range(nfr) for c in range(nch)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, nch, 8000, 8000 * nch * 2, nch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    pdf = pd.DataFrame({"media_id": [7], "payload": [wav]})
    (out,) = list(_wav_decode_batches(iter([pdf])))
    row = out.iloc[0]
    assert bool(row["decoded_ok"]) and row["n_channels"] == 3
    assert row["sum_ch1"] == sum(samples[1::nch]) != 0
