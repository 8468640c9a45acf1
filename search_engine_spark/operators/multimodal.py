"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` payloads with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas``. The Spark-side plumbing
here — schemas, batch iteration, partitioning, UDF signatures — is real and
tested; the codec seam is optional-PIL: ``_decode_payload`` parses the
deterministic FIMG test format and real 24-bpp BMP natively and routes
any other payload through PIL when Pillow is importable (grayscale
decode), raising ``NotImplementedError`` when it is not (this container
ships no image libraries — the PIL branch is exercised by skip-marked
tests wherever Pillow exists). Audio and video have the same two-tier
design: ``_decode_wav`` parses real PCM16 mono RIFF/WAVE natively
(stdlib-``wave`` cross-checked) and raises at the seam where
soundfile/librosa would slot in for compressed codecs; ``_decode_y4m``
parses real monochrome YUV4MPEG2 streams natively and raises at the seam
where ffmpeg/PyAV would slot in for chroma-subsampled or compressed
video.

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
                if kind == "audio":
                    payload = encode_linear_audio(mid, 64 + mid % 101)
                    meta = {"width": 0, "height": 0, "n_frames": 0,
                            "sample_rate": 16000, "codec": "pcm16"}
                elif kind == "video":
                    payload = encode_linear_video(mid, nf, w, h)
                    meta = {"width": w, "height": h, "n_frames": nf,
                            "sample_rate": 0, "codec": "y4m"}
                else:
                    payload = encode_fake_image(w, h, seed=mid)
                    meta = {"width": w, "height": h, "n_frames": nf,
                            "sample_rate": 0, "codec": "fimg"}
                rows.append((mid, mid // 2, kind, payload, meta))
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

    kind cycles image/audio/video by ``doc_id % 3``; image/video dims are
    ``(4 + doc_id % 13) x (3 + doc_id % 7)``; video frame counts are
    ``8 + doc_id % 25``. Image payloads use the linear pixel rule
    (:func:`encode_linear_image`); audio payloads are REAL PCM16 WAV
    files with ``64 + doc_id % 101`` samples following the linear sample
    rule (:func:`encode_linear_audio`); video payloads are REAL
    monochrome Y4M streams following the linear luma rule
    (:func:`encode_linear_video`). Everything is a pure function of
    doc_id, so the gate oracle can mirror every decode stat exactly."""
    src = docs.select(F.col("doc_id").cast("long"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = ("image", "audio", "video")[did % 3]
                if kind == "audio":
                    n = 64 + did % 101
                    rows.append(
                        (did, did, kind, encode_linear_audio(did, n),
                         {"width": 0, "height": 0, "n_frames": 0,
                          "sample_rate": 16000, "codec": "pcm16"})
                    )
                    continue
                w, h = 4 + did % 13, 3 + did % 7
                if kind == "video":
                    nf = 8 + did % 25
                    rows.append(
                        (did, did, kind, encode_linear_video(did, nf, w, h),
                         {"width": w, "height": h, "n_frames": nf,
                          "sample_rate": 0, "codec": "y4m"})
                    )
                    continue
                rows.append(
                    (did, did, kind, encode_linear_image(did, w, h),
                     {"width": w, "height": h, "n_frames": 1,
                      "sample_rate": 0, "codec": "fimg"})
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


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 mono sample array as a REAL RIFF/WAVE file
    (PCM format 1, 1 channel, 16-bit little-endian) — spec-complete, so
    any audio tool (including Python's stdlib ``wave`` module) opens it.
    The audio analogue of :func:`encode_bmp_gray`: it gives the
    real-audio-format branch of :func:`decode_audio` an executed,
    byte-verifiable path without any audio library."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_linear_audio(
    doc_id: int, n_samples: int, sample_rate: int = 16000
) -> bytes:
    """WAV payload whose samples follow a linear rule in (doc_id, index):
    ``s[i] = ((doc_id*131 + i*17) % 4096) - 2048``. Like
    :func:`encode_linear_image`, chosen so an external SQL engine can
    reproduce every decode statistic arithmetically — this is what lets
    the audio decode path be oracle-checked end-to-end."""
    idx = np.arange(n_samples, dtype=np.int64)
    s = ((doc_id * 131 + idx * 17) % 4096 - 2048).astype(np.int16)
    return encode_wav_pcm16(s, sample_rate)


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Pure-Python RIFF chunk walker → (sample_rate, int16 mono samples).

    Decodes PCM16 mono natively (the format :func:`encode_wav_pcm16`
    emits and the one real-world ASR pipelines normalize to). Walks
    chunks properly — unknown chunks (LIST/INFO, cue, odd-length with
    pad byte) are skipped per spec, so third-party WAVs with metadata
    still decode. Non-PCM / multichannel / non-16-bit raises
    ``NotImplementedError``: the seam where a real deployment slots in
    soundfile/librosa, mirroring the optional-PIL image seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if (audio_fmt, n_ch, bits) != (1, 1, 16):
        raise NotImplementedError(
            f"only PCM16 mono WAV is decoded natively (got format="
            f"{audio_fmt}, channels={n_ch}, bits={bits}); other audio "
            f"routes through an external codec library (soundfile/librosa)"
        )
    return int(rate), np.frombuffer(data, dtype="<i2")


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


def encode_y4m_gray(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode an (n_frames, H, W) uint8 array as a REAL YUV4MPEG2 (.y4m)
    stream — monochrome colourspace (``Cmono``: luma plane only), the
    plain-text-header raw-frame container ffmpeg/mpv/mjpegtools read
    directly. The video analogue of :func:`encode_bmp_gray` /
    :func:`encode_wav_pcm16`: it gives the real-video-format branch an
    executed, byte-verifiable path without any video library."""
    frames = np.ascontiguousarray(frames).astype(np.uint8, copy=False)
    nf, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(
        b"FRAME\n" + frames[f].tobytes() for f in range(nf)
    )


def encode_linear_video(
    doc_id: int, n_frames: int, width: int, height: int
) -> bytes:
    """Y4M payload whose luma follows a linear rule in (doc_id, frame,
    pixel index): ``px[f][i] = (doc_id*31 + f*257 + i*7) % 256``. Like the
    image/audio linear rules, chosen so an external SQL engine reproduces
    every per-frame decode statistic arithmetically."""
    f = np.arange(n_frames, dtype=np.int64)[:, None]
    i = np.arange(width * height, dtype=np.int64)[None, :]
    px = ((doc_id * 31 + f * 257 + i * 7) % 256).astype(np.uint8)
    return encode_y4m_gray(px.reshape(n_frames, height, width))


def _decode_y4m(payload: bytes) -> np.ndarray:
    """Pure-Python YUV4MPEG2 parser → (n_frames, H, W) uint8 luma.

    Parses the space-separated header tags (W/H/F/I/A/C...), then walks
    ``FRAME`` markers (per spec each may carry its own parameters up to
    the newline). Monochrome (``Cmono``) decodes natively — the format
    :func:`encode_y4m_gray` emits; chroma-subsampled colourspaces (C420
    et al.) raise ``NotImplementedError``: the seam where a real
    deployment slots in ffmpeg/PyAV, mirroring the image/audio seams."""
    eol = payload.find(b"\n")
    if eol < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    cspace = "420jpeg"  # the Y4M default when no C tag is present
    for tag in payload[:eol].decode("ascii", "replace").split()[1:]:
        if tag[0] == "W":
            w = int(tag[1:])
        elif tag[0] == "H":
            h = int(tag[1:])
        elif tag[0] == "C":
            cspace = tag[1:]
    if w <= 0 or h <= 0:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if cspace != "mono":
        raise NotImplementedError(
            f"only monochrome (Cmono) Y4M is decoded natively (got "
            f"C{cspace}); chroma-subsampled video routes through an "
            f"external codec library (ffmpeg/PyAV)"
        )
    frames, pos, fsize = [], eol + 1, w * h
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        fe = payload.find(b"\n", pos)  # frame line may carry parameters
        if fe < 0 or fe + 1 + fsize > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(payload, np.uint8, count=fsize, offset=fe + 1)
        )
        pos = fe + 1 + fsize
    return np.stack(frames).reshape(len(frames), h, w) if frames else (
        np.empty((0, h, w), np.uint8)
    )


FRAME_STATS_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, "
    "sum_luma bigint, max_luma int"
)


def decode_frames(media: DataFrame, every_k: int = 1) -> DataFrame:
    """Video decode stage: Y4M payload → per-frame luma stats for every
    k-th frame. The payload-decoding sibling of the metadata-only
    :func:`sample_frames`: Arrow-batched ``mapInPandas``, one container
    parse per row, integer-exact outputs so the gate oracle mirrors them
    without float hazards."""
    src = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fr = _decode_y4m(bytes(payload))
                for fi in range(0, fr.shape[0], every_k):
                    plane = fr[fi]
                    out.append(
                        (int(mid), fi, plane.shape[1], plane.shape[0],
                         int(plane.astype(np.int64).sum()),
                         int(plane.max()) if plane.size else 0)
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "width", "height",
                         "sum_luma", "max_luma"],
            )

    return src.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples bigint, "
    "sum_amp bigint, max_amp int, sha1 string"
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio decode stage: WAV payload → per-clip sample stats. The audio
    sibling of :func:`decode_images`: Arrow-batched ``mapInPandas``, one
    codec call per row inside the batch loop. Stats are integer-exact
    (BIGINT sample sum / max amplitude) so the gate oracle can mirror
    them without float-rounding hazards."""
    src = media.filter(F.col("kind") == "audio").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, s = _decode_wav(bytes(payload))
                out.append(
                    (int(mid), rate, int(s.size),
                     int(s.astype(np.int64).sum()),
                     int(s.max()) if s.size else 0,
                     hashlib.sha1(s.tobytes()).hexdigest())
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "sample_rate", "n_samples",
                         "sum_amp", "max_amp", "sha1"],
            )

    return src.mapInPandas(run, schema=AUDIO_SCHEMA)


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
