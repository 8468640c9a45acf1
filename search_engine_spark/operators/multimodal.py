"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` payloads with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas``. The Spark-side plumbing
here — schemas, batch iteration, partitioning, UDF signatures — is real and
tested; the codec seam is optional-PIL: ``_decode_payload`` parses the
deterministic FIMG test format natively and routes any other payload
through PIL when Pillow is importable (grayscale decode), raising
``NotImplementedError`` when it is not (this container ships no image
libraries — the PIL branch is exercised by skip-marked tests wherever
Pillow exists).

Media table schema:
    media(media_id long, doc_id long, kind string,        -- image|audio|video
          payload binary,
          meta struct<width:int, height:int, n_frames:int,
                      sample_rate:int, codec:string>)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, doc_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>"
)

FAKE_MAGIC = b"FIMG"  # deterministic fake image format: FIMG | w | h | pixels


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload (seeded bytes, real header)."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def gen_media_df(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Synthetic media table — distributed generation, one row per id."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                w, h = 8 + mid % 24, 8 + (mid // 3) % 16
                nf = 1 if kind == "image" else 16 + mid % 32
                sr = 16000 if kind == "audio" else 0
                payload = encode_fake_image(w, h, seed=mid)
                rows.append(
                    (mid, mid // 2, kind, payload,
                     {"width": w, "height": h, "n_frames": nf,
                      "sample_rate": sr, "codec": "fimg"})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "kind", "payload", "meta"]
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def encode_linear_image(doc_id: int, width: int, height: int) -> bytes:
    """FIMG payload whose pixels follow a linear rule in (doc_id, index):
    ``px[i] = (doc_id*31 + i*7) % 256``. Chosen so an external SQL engine
    can reproduce every decode statistic arithmetically — this is what lets
    the multimodal decode/resize path be oracle-checked end-to-end."""
    idx = np.arange(width * height, dtype=np.int64)
    px = ((doc_id * 31 + idx * 7) % 256).astype(np.uint8)
    return FAKE_MAGIC + struct.pack("<II", width, height) + px.tobytes()


def media_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from a documents(doc_id, ...) table.

    kind cycles image/audio/video by ``doc_id % 3``; image dims are
    ``(4 + doc_id % 13) x (3 + doc_id % 7)``; video frame counts are
    ``8 + doc_id % 25``; payloads use the linear pixel rule
    (:func:`encode_linear_image`). Everything is a pure function of doc_id,
    so the gate oracle can mirror decode/resize/frame-sample exactly."""
    src = docs.select(F.col("doc_id").cast("long"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = ("image", "audio", "video")[did % 3]
                w, h = 4 + did % 13, 3 + did % 7
                nf = 1 if kind == "image" else 8 + did % 25
                sr = 16000 if kind == "audio" else 0
                rows.append(
                    (did, did, kind, encode_linear_image(did, w, h),
                     {"width": w, "height": h, "n_frames": nf,
                      "sample_rate": sr, "codec": "fimg"})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "kind", "payload", "meta"]
            )

    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


def encode_bmp_gray(pixels: np.ndarray) -> bytes:
    """Encode an HxW uint8 array as a REAL 24-bpp uncompressed Windows BMP
    (BI_RGB, bottom-up, R=G=B). This is a spec-complete file any image
    viewer or PIL opens — it exists so the 'real image format' branch of
    :func:`_decode_payload` has an executed, byte-verifiable path even in
    environments without Pillow."""
    pixels = np.ascontiguousarray(pixels).astype(np.uint8, copy=False)
    h, w = pixels.shape
    stride = (w * 3 + 3) & ~3
    img = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = np.repeat(pixels[y], 3).tobytes()  # gray -> BGR triples
        img += row + b"\x00" * (stride - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(img), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(img)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-Python/numpy decoder for 24-bpp uncompressed (BI_RGB) BMP →
    HxW uint8 grayscale. Handles bottom-up (positive height) and top-down
    (negative height) row order and 4-byte row padding. Grayscale uses the
    same ITU-R 601-2 integer luma as Pillow's ``convert("L")``
    ((19595 R + 38470 G + 7471 B + 0x8000) >> 16), so for any BMP this
    decode matches what the PIL branch would produce — exactly equal on
    R=G=B content, where every luma variant agrees."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bpp uncompressed BMP is decoded natively "
            f"(got bpp={bpp}, compression={compression}); other BMP "
            f"flavors route through PIL"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        raw = raw[::-1]
    b, g, r = (raw[..., i].astype(np.uint32) for i in range(3))
    return ((19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16).astype(
        np.uint8
    )


def _decode_payload(payload: bytes) -> np.ndarray:
    """Decode one payload → HxW uint8 (grayscale) array.

    FIMG (the deterministic test format) decodes natively, as does
    24-bpp uncompressed BMP (:func:`_decode_bmp` — the executed
    real-format path); any other payload routes through PIL when it is
    importable — the optional-codec seam — and raises
    ``NotImplementedError`` when it is not (this container ships no image
    libraries). The import is per-call-site lazy so executors without PIL
    still run every FIMG/BMP plan."""
    if payload[:4] == FAKE_MAGIC:
        w, h = struct.unpack("<II", payload[4:12])
        return np.frombuffer(
            payload[12 : 12 + w * h], dtype=np.uint8
        ).reshape(h, w)
    if payload[:2] == b"BM":
        try:
            return _decode_bmp(payload)
        except NotImplementedError:
            pass  # exotic BMP flavor: fall through to the PIL seam
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "payload is not in the deterministic FIMG test format and PIL "
            "is not installed; install Pillow to decode real image formats"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


DECODED_SCHEMA = (
    "media_id long, width int, height int, mean_px double, sha1 string"
)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode stage: payload → per-image stats. Arrow-batched; one decode
    per row inside the batch loop (the vectorizable part at scale is the
    batch transfer, not the codec)."""
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                out.append(
                    (int(mid), arr.shape[1], arr.shape[0],
                     float(np.floor(arr.mean() * 1e6) / 1e6),
                     hashlib.sha1(arr.tobytes()).hexdigest())
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_px", "sha1"]
            )

    return src.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize (pure numpy — this part needs no external
    codec) → re-encoded payload."""
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                ys = (np.arange(out_h) * arr.shape[0] // out_h).clip(0, arr.shape[0] - 1)
                xs = (np.arange(out_w) * arr.shape[1] // out_w).clip(0, arr.shape[1] - 1)
                res = arr[np.ix_(ys, xs)]
                blob = FAKE_MAGIC + struct.pack("<II", out_w, out_h) + res.tobytes()
                out.append((int(mid), out_w, out_h, blob))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "payload"]
            )

    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "media_id long, embedding array<float>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: payload → unit-norm embedding. The embedding is
    a deterministic digest-seeded vector (a real model server / ONNX call
    slots in here); the Spark plumbing (binary → array<float>) is real."""
    src = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                seed = int.from_bytes(digest[:8], "little")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                ids.append(int(mid))
                vecs.append(v.tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return src.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_ref string"


def sample_frames(media: DataFrame, every_k: int = 8) -> DataFrame:
    """Frame sampling for video rows — emits (media_id, frame_idx) refs
    from metadata only (no payload decode): pure built-ins, no Python."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.n_frames") - 1,
                F.lit(every_k),
            )
        ).alias("frame_idx"),
    ).withColumn(
        "frame_ref",
        F.concat_ws("#", F.col("media_id"), F.col("frame_idx")),
    )
