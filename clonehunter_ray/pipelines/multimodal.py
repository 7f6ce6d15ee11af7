"""Multimodal columns: real decode + feature extraction, no codecs.

Images/audio/video ride the pipeline as opaque ``binary`` columns with
typed metadata (the training-data-pipeline pattern: payloads are
blobs, everything wide operates on ids + small features). Three
uncompressed container formats are decoded FOR REAL with stdlib +
numpy — no PIL/ffmpeg needed:

* image: 24-bit uncompressed BMP (``BITMAPINFOHEADER``, bottom-up,
  4-byte row padding)
* audio: WAV PCM16 (RIFF chunk walk via the stdlib ``wave`` module)
* video: YUV4MPEG2 (y4m) ``Cmono`` — plain-text header, ``FRAME``
  markers, raw luma planes

Compressed formats (PNG/JPEG/MP4/...) are detected by magic-byte
sniffing and honestly rejected with ``DecodeError`` — swap a real
codec into ``MediaFeatureStage._decode_*`` in production. Container-
level operators (MIME sniff, byte entropy, exact payload dedup) need
no decode at all and work on any format.

Scale notes: payloads are wide, so batches are small
(``batch_size=16``); only ids + fixed-dim features leave the actor
pool; the exact-dedup shuffle moves (sha256, media_id) — never the
payload bytes.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeError(NotImplementedError):
    """Raised for payloads in formats this environment cannot decode
    (compressed codecs: PNG/JPEG/MP4/...). The uncompressed formats
    (BMP / WAV-PCM / y4m) decode for real; plug PIL/torchaudio/decord
    into MediaFeatureStage to widen coverage in production."""


# ---------------------------------------------------------------------------
# magic-byte MIME sniffing (container-level, any format)

_MAGIC = [
    (b"BM", "image/bmp"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"YUV4MPEG2", "video/x-yuv4mpeg"),
    (b"OggS", "audio/ogg"),
]


def sniff_mime(payload: bytes) -> str:
    """Detect the container format from magic bytes (the only
    trustworthy MIME source in a scraped corpus — declared MIME lies)."""
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def byte_entropy(payload: bytes) -> float:
    """Shannon entropy of the byte distribution (bits/byte). High
    entropy ~ compressed/encrypted; low ~ raw/sparse payloads."""
    if not payload:
        return 0.0
    counts = np.bincount(np.frombuffer(payload, np.uint8), minlength=256)
    p = counts[counts > 0] / len(payload)
    return float(-(p * np.log2(p)).sum())


# ---------------------------------------------------------------------------
# real encoders (synthesis) + decoders, stdlib/numpy only

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), np.uint8)
    # BMP stores BGR, bottom-up
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise DecodeError(f"not a BMP payload: {sniff_mime(payload)}")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise DecodeError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    pixels = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return pixels[::-1] if bottom_up else pixels


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> WAV PCM16 bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM16 bytes -> (int16 samples [n, channels], sample_rate)."""
    if sniff_mime(payload) != "audio/wav":
        raise DecodeError(f"not a WAV payload: {sniff_mime(payload)}")
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise DecodeError(f"unsupported WAV sample width {w.getsampwidth()}")
            frames = w.readframes(w.getnframes())
            rate = w.getframerate()
            nch = w.getnchannels()
    except wave.Error as exc:
        raise DecodeError(f"corrupt WAV: {exc}") from exc
    return np.frombuffer(frames, "<i2").reshape(-1, nch), rate


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(T, H, W) uint8 luma frames -> YUV4MPEG2 Cmono bytes."""
    t, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()]
    for i in range(t):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 Cmono bytes -> ((T, H, W) uint8 luma frames, fps)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise DecodeError(f"not a y4m payload: {sniff_mime(payload)}")
    nl = payload.index(b"\n")
    w = h = fps = 0
    colorspace = "C420jpeg"  # y4m default when absent
    for tok in payload[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            colorspace = tok
    if colorspace != "Cmono":
        raise DecodeError(f"unsupported y4m colorspace {colorspace}")
    frame_bytes = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise DecodeError("corrupt y4m: missing FRAME marker")
        start = fnl + 1
        frames.append(
            np.frombuffer(payload, np.uint8, count=frame_bytes, offset=start).reshape(h, w)
        )
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W[, C]) array — pure index math."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[rows][:, cols]


# ---------------------------------------------------------------------------
# deterministic synthetic corpus (real payloads in all three formats)

def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media rows whose payloads are REAL containers:
    BMP images, WAV PCM16 audio, y4m mono video. A fixed fraction are
    exact-duplicate payloads (same generator sub-seed) so dedup
    operators have positives to find."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows: dict[str, list] = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        # every 8th row (past the first 24) reuses the row 24 earlier's
        # content seed -> exact dup. The 24-stride keeps the SAME kind
        # (24 % 3 == 0), so all three media kinds get dedup positives —
        # a same-seed row of a different kind would take a different
        # payload branch and produce a unique payload, not a duplicate.
        content_seed = (
            seed * 1000 + i - 24 if (i % 8 == 7 and i >= 24) else seed * 1000 + i
        )
        crng = np.random.RandomState(content_seed % (2**31))
        if kind == "image":
            h, w = int(crng.randint(8, 48)), int(crng.randint(8, 48))
            base = np.linspace(0, 255, w, dtype=np.float64)
            pixels = (
                base[None, :, None] + crng.randint(0, 64, (h, w, 3))
            ).astype(np.uint8)
            payload, dur = encode_bmp(pixels), 0
        elif kind == "audio":
            rate = 8000
            n_samp = int(crng.randint(800, 4000))
            t = np.arange(n_samp) / rate
            freq = float(crng.randint(100, 1200))
            sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * crng.randn(n_samp)
            payload = encode_wav((sig * 32767 * 0.5).astype(np.int16), rate)
            h, w, dur = 0, 0, int(n_samp * 1000 / rate)
        else:
            t_frames, h, w = int(crng.randint(3, 9)), 16, 16
            fps = 25
            frames = crng.randint(0, 256, (t_frames, h, w)).astype(np.uint8)
            payload, dur = encode_y4m(frames, fps), int(t_frames * 1000 / fps)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(sniff_mime(payload))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# actor-pool stages

class MediaFeatureStage:
    """Actor-pool feature extractor: decode (real) + fixed-dim feature.

    Per-kind content features from the DECODED payload:

    * image: 4x4 nearest-neighbor luma thumbnail (16 dims) + RGB
      channel means/stds
    * audio: RMS, zero-crossing rate, duration, log-spaced |FFT|
      spectrum bands
    * video: per-sampled-frame mean luma + inter-frame diff energy

    The per-kind vector is tiled/truncated to ``dim`` and
    L2-normalized so every row yields the same feature width
    (downstream ANN/dedup operators want one fixed-size column).
    ``on_undecodable`` controls compressed/corrupt payloads:
    ``"raise"`` (default) propagates DecodeError; ``"null"`` emits a
    zero vector with ``decode_ok=false`` — the scraped-corpus setting,
    where a bad payload must not kill a 100 TB job.
    """

    def __init__(self, dim: int = 16, on_undecodable: str = "raise") -> None:
        if on_undecodable not in ("raise", "null"):
            raise ValueError(f"on_undecodable={on_undecodable!r}")
        self.dim = dim
        self.on_undecodable = on_undecodable

    # -- per-kind decoded-content features ---------------------------------
    def _image_features(self, payload: bytes) -> np.ndarray:
        pixels = decode_bmp(payload)
        luma = pixels.astype(np.float64).mean(axis=2)
        thumb = resize_nearest(luma, 4, 4).ravel() / 255.0
        chan = pixels.reshape(-1, 3).astype(np.float64)
        stats = np.concatenate([chan.mean(axis=0) / 255.0, chan.std(axis=0) / 255.0])
        return np.concatenate([thumb, stats])

    def _audio_features(self, payload: bytes) -> np.ndarray:
        samples, rate = decode_wav(payload)
        mono = samples.mean(axis=1) / 32768.0
        rms = float(np.sqrt((mono**2).mean())) if len(mono) else 0.0
        zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if len(mono) > 1 else 0.0
        dur = len(mono) / rate
        spec = np.abs(np.fft.rfft(mono, n=256))
        edges = np.unique(np.geomspace(1, len(spec) - 1, 9).astype(np.int64))
        bands = np.add.reduceat(spec, edges)[:8]
        bands = bands / (bands.sum() + 1e-12)
        return np.concatenate([[rms, zcr, dur], bands])

    def _video_features(self, payload: bytes) -> np.ndarray:
        frames, _fps = decode_y4m(payload)
        if not len(frames):
            return np.zeros(5)
        idx = np.linspace(0, len(frames) - 1, 4).astype(np.int64)
        sampled = frames[idx].astype(np.float64) / 255.0
        means = sampled.mean(axis=(1, 2))
        diff = (
            float(np.abs(np.diff(sampled, axis=0)).mean()) if len(sampled) > 1 else 0.0
        )
        return np.concatenate([means, [diff]])

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        fn = {
            "image": self._image_features,
            "audio": self._audio_features,
            "video": self._video_features,
        }.get(kind)
        if fn is None:
            raise DecodeError(f"unknown media kind {kind!r}")
        try:
            raw = fn(payload)
        except DecodeError:
            raise
        except (ValueError, struct.error, wave.Error, EOFError, IndexError) as e:
            # truncated/corrupt payloads surface as codec-internal
            # errors (struct unpack past EOF, short numpy buffers,
            # missing y4m headers) — normalize them to DecodeError so
            # on_undecodable="null" keeps its contract: one bad payload
            # must not kill a 100 TB job
            raise DecodeError(f"malformed {kind} payload: {e}") from e
        v = np.resize(raw, self.dim)  # tile/truncate to the fixed width
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        # per-row loop is inherent: each payload is one decode unit;
        # batches are small (wide binary rows) and the pool is the
        # parallelism axis
        for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist()):
            try:
                feats.append(self._decode(p, k).tolist())
                ok.append(True)
            except DecodeError:
                if self.on_undecodable == "raise":
                    raise
                feats.append([0.0] * self.dim)
                ok.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


def extract_media_features(
    media_ds: "ray.data.Dataset",
    dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 16,  # small: wide binary rows
    on_undecodable: str = "raise",
):
    return media_ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"dim": dim, "on_undecodable": on_undecodable},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# container-level operators (no decode; any format)

def media_container_stats(media_ds: "ray.data.Dataset"):
    """Per-payload container facts: size, sniffed MIME, byte entropy,
    sha256 — the triage pass a scraped-media pipeline runs before any
    decode (type verification, corruption heuristics, dedup keys)."""

    def _stats(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "size_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "sniffed_mime": pa.array([sniff_mime(p) for p in payloads], pa.string()),
                "entropy": pa.array([byte_entropy(p) for p in payloads], pa.float64()),
                "payload_sha256": pa.array(
                    [hashlib.sha256(p).hexdigest() for p in payloads], pa.string()
                ),
            }
        )

    return media_ds.map_batches(_stats, batch_format="pyarrow", batch_size=64)


def dedup_media_exact(media_ds: "ray.data.Dataset"):
    """Exact payload dedup: group by sha256, keep min media_id. Only
    (sha256, media_id) rows cross the shuffle — payload bytes stay in
    their blocks."""
    stats = media_container_stats(media_ds).select_columns(
        ["payload_sha256", "media_id"]
    )

    def _keep_min(group: pa.Table) -> pa.Table:
        ids = group["media_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "payload_sha256": group["payload_sha256"][:1],
                "media_id": pa.array([int(ids.min())], pa.int64()),
                "n_copies": pa.array([len(ids)], pa.int64()),
            }
        )

    return stats.groupby("payload_sha256").map_groups(
        _keep_min, batch_format="pyarrow"
    )


def sample_video_frames(media_ds: "ray.data.Dataset", k: int = 4):
    """Evenly sample k frames from each video payload; one output row
    per (media_id, frame). Frames leave as small re-encoded BMPs so a
    downstream image stage can consume them unchanged."""

    def _sample(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_bmp": []
        }
        for mid, kind, p in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            frames, fps = decode_y4m(p)
            if not len(frames):
                continue
            idx = np.unique(np.linspace(0, len(frames) - 1, k).astype(np.int64))
            for i in idx:
                gray = frames[i]
                out["media_id"].append(mid)
                out["frame_idx"].append(int(i))
                out["frame_ts_ms"].append(int(i * 1000 / max(fps, 1)))
                out["frame_bmp"].append(encode_bmp(np.repeat(gray[:, :, None], 3, 2)))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame_ts_ms": pa.array(out["frame_ts_ms"], pa.int32()),
                "frame_bmp": pa.array(out["frame_bmp"], pa.binary()),
            }
        )

    return media_ds.map_batches(_sample, batch_format="pyarrow", batch_size=16)


def resize_images(media_ds: "ray.data.Dataset", out_h: int = 8, out_w: int = 8):
    """Decode BMP images, nearest-neighbor resize, re-encode as BMP.
    One row out per image row in; non-image rows are dropped."""

    def _resize(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {"media_id": [], "width": [], "height": [], "payload": []}
        for mid, kind, p in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "image":
                continue
            resized = resize_nearest(decode_bmp(p), out_h, out_w)
            out["media_id"].append(mid)
            out["width"].append(out_w)
            out["height"].append(out_h)
            out["payload"].append(encode_bmp(resized))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "payload": pa.array(out["payload"], pa.binary()),
            }
        )

    return media_ds.map_batches(_resize, batch_format="pyarrow", batch_size=16)
