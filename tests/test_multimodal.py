"""Multimodal binary-payload plumbing (SURVEY.md §2.2 north star).

The fixtures carry text bytes, so these tests prove the parts a real
media pipeline needs and the fixtures don't exercise: BinaryType
columns surviving a parquet round-trip with NON-UTF-8 bytes, the
optional-codec decode (PIL when installed, deterministic fake
otherwise), and the Arrow featurizer running over real binary data.
"""

import pytest

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.multimodal import (
    _image_decoder,
    decode_image,
)

# bytes that are NOT valid UTF-8 (0x89 PNG magic + raw high bytes)
PAYLOADS = [
    b"\x89PNG\r\n\x1a\n" + bytes(range(250, 256)) * 4,
    b"\xff\xd8\xff\xe0" + b"\x00\xfe" * 10,  # JPEG SOI/APP0-ish
    b"",  # empty payload must not crash anything
]


def test_decode_image_fallback_is_deterministic():
    """Whether PIL is installed or not, undecodable payloads get the
    deterministic fake: dims derived from first/last byte, flagged
    'fake'; empty bytes → 0×0. Decoding twice gives identical output."""
    for p in PAYLOADS:
        d1, d2 = decode_image(p), decode_image(p)
        assert d1 == d2
        assert d1["decoder"] == "fake"  # none of these are real images
        if p:
            assert d1["width"] == 16 + (p[0] % 64)
            assert d1["height"] == 16 + (p[-1] % 64)
        else:
            assert (d1["width"], d1["height"]) == (0, 0)


def test_decode_closure_pickles_by_value():
    """The executor-bound decoder must deserialize WITHOUT importing
    this package (workers may lack the repo on PYTHONPATH): cloudpickle
    must carry the code itself, not a module reference. Proven by
    unpickling with the package evicted from sys.modules and its import
    blocked."""
    import sys

    from pyspark import cloudpickle

    blob = cloudpickle.dumps(_image_decoder())

    pkg = "nthu_cs542200_parallel_programming_hw4_mapreduce_spark"
    saved = {k: sys.modules.pop(k) for k in list(sys.modules) if k.startswith(pkg)}

    class _Block:
        def find_spec(self, name, path=None, target=None):
            if name.startswith(pkg):
                raise ImportError(f"blocked: {name}")
            return None

    blocker = _Block()
    sys.meta_path.insert(0, blocker)
    try:
        restored = cloudpickle.loads(blob)
        assert restored(PAYLOADS[0]) == decode_image(PAYLOADS[0])
    finally:
        sys.meta_path.remove(blocker)
        sys.modules.update(saved)


def test_binary_parquet_roundtrip_and_featurize(spark, tmp_path):
    """Non-UTF-8 binary payloads must survive parquet write→read
    bit-exactly, and the mapInPandas featurizer must run on REAL binary
    data (not text re-encoded): widths/heights follow decode_image,
    byte_sum/n_bytes follow the raw bytes."""
    from pyspark.sql import functions as F

    src = [(i, p) for i, p in enumerate(PAYLOADS)]
    df = spark.createDataFrame(src, "doc_id long, payload binary")
    path = str(tmp_path / "bin.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["payload"] == "binary"
    got = {r["doc_id"]: bytes(r["payload"]) for r in back.collect()}
    assert got == dict(src)  # bit-exact round trip

    decode = _image_decoder()

    def feats(batches):
        import pandas as pd

        for pdf in batches:
            raw = pdf["payload"]
            dec = [decode(bytes(b)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": raw.map(len),
                    "width": [d["width"] for d in dec],
                    "height": [d["height"] for d in dec],
                }
            )

    out = {
        r["doc_id"]: r.asDict()
        for r in back.mapInPandas(
            feats, schema="doc_id long, n_bytes int, width int, height int"
        ).collect()
    }
    for i, p in src:
        exp = decode_image(p)
        assert out[i]["n_bytes"] == len(p)
        assert out[i]["width"] == exp["width"]
        assert out[i]["height"] == exp["height"]


def test_decode_image_really_decodes_bmp(spark, tmp_path_factory):
    """A real (tiny, hand-packed) BMP payload must decode via the
    stdlib BMP branch — width/height/mode from the actual header, not
    the deterministic fake."""
    import struct

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.multimodal import (
        decode_image,
    )

    w, h = 3, 2
    row = b"\x00\x00\xff" * w + b"\x00" * ((4 - (w * 3) % 4) % 4)  # padded
    pixels = row * h
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    bmp = header + info + pixels

    meta = decode_image(bmp)
    assert meta == {"width": 3, "height": 2, "mode": "RGB", "decoder": "bmp"}
    # non-BMP bytes still fall back to the deterministic fake
    assert decode_image(b"not an image")["decoder"] == "fake"
