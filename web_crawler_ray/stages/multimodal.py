"""Multimodal (image) stages over the input_hint table
(image_id, bytes, w, h, fmt, caption, phash).

Binary payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batch sizes (binary rows are heavy —
SURVEY.md §4.2 "wide binary rows"). The codec itself is the
deterministic stand-in from ``codecs.py`` (PIL absent in this
container); everything else — schema, batch sizing, actor signature,
output layout — is the real plumbing.

Recommended batch_size for these stages: 64-256 rows (≈1-50 MB of
pixels per batch at training-image sizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode_image, decode_video, encode_image, phash64, psnr
from ..functions.rounding import sql_round


class DecodeAndValidate:
    """Actor stage: decode every image, verify the stored metadata
    (w/h/fmt) and the input_hint invariant (PSNR≥min_psnr for lossy —
    here vs the re-decoded roundtrip), recompute phash. Emits per-row
    validity columns; invalid rows are data, not exceptions."""

    def __init__(self, min_psnr: float = 40.0):
        self.min_psnr = min_psnr

    def __call__(self, batch: pa.Table) -> pa.Table:
        datas = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        phs = batch["phash"].to_pylist()
        ok, ph_ok, decoded_w, decoded_h = [], [], [], []
        for data, w, h, ph in zip(datas, ws, hs, phs):
            try:
                px = decode_image(data)
            except Exception:
                ok.append(False); ph_ok.append(False); decoded_w.append(0); decoded_h.append(0)
                continue
            decoded_h.append(px.shape[0])
            decoded_w.append(px.shape[1])
            ok.append(px.shape[0] == h and px.shape[1] == w)
            ph_ok.append(phash64(px) == ph)
        return (
            batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
            .append_column("phash_ok", pa.array(ph_ok, pa.bool_()))
            .append_column("decoded_w", pa.array(decoded_w, pa.int32()))
            .append_column("decoded_h", pa.array(decoded_h, pa.int32()))
        )


class ResizeImages:
    """Actor stage: decode → mean-pool resize to (target, target) →
    re-encode. Stand-in for a real resample kernel; demonstrates the
    decode→transform→encode actor shape and keeps bytes binary."""

    def __init__(self, target: int = 32, out_fmt: str = "png"):
        self.target = target
        self.out_fmt = out_fmt

    def _resize(self, px: np.ndarray) -> np.ndarray:
        t = self.target
        h, w = px.shape[:2]
        ys = (np.arange(t + 1) * h) // t
        xs = (np.arange(t + 1) * w) // t
        out = np.empty((t, t, 3), dtype=np.uint8)
        for i in range(t):
            for j in range(t):
                block = px[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)]
                out[i, j] = block.mean(axis=(0, 1)).astype(np.uint8)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, out_w, out_h = [], [], []
        for data in batch["bytes"].to_pylist():
            px = self._resize(decode_image(data))
            out_bytes.append(encode_image(px, self.out_fmt))
            out_w.append(self.target)
            out_h.append(self.target)
        names = batch.schema.names
        batch = batch.set_column(names.index("bytes"), "bytes", pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index("w"), "w", pa.array(out_w, pa.int32()))
        batch = batch.set_column(names.index("h"), "h", pa.array(out_h, pa.int32()))
        return batch.set_column(
            names.index("fmt"), "fmt", pa.array([self.out_fmt] * len(out_bytes), pa.string())
        )


class ImageFeatures:
    """Actor stage: decode → cheap global features (mean/std per channel,
    luminance entropy bucket histogram) as fixed-width columns — the
    shape of a real embedding/feature-extraction stage (model load would
    live in __init__)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, entropies = [], [], []
        for data in batch["bytes"].to_pylist():
            px = decode_image(data).astype(np.float64)
            means.append([float(m) for m in px.mean(axis=(0, 1))])
            stds.append([float(s) for s in px.std(axis=(0, 1))])
            gray = (px @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
            hist = np.bincount(gray.flatten() >> 4, minlength=16).astype(np.float64)
            p = hist / hist.sum()
            nz = p[p > 0]
            entropies.append(float(-(nz * np.log2(nz)).sum()))
        return (
            batch.append_column("rgb_mean", pa.array(means, pa.list_(pa.float64(), 3)))
            .append_column("rgb_std", pa.array(stds, pa.list_(pa.float64(), 3)))
            .append_column("luma_entropy", pa.array(entropies, pa.float64()))
        )


def decode_video_frames(*_args, **_kwargs):
    """Frame sampling for video payloads — requires a video decoder that
    is not present in this container."""
    raise NotImplementedError(
        "video decode is stubbed: no av/ffmpeg in the sandbox. The actor "
        "shape is identical to DecodeAndValidate with a frames list column."
    )


class VideoFrameSample:
    """Actor stage: synthetic-container video column → every ``stride``-th
    frame re-emitted as a list<binary> column (+ frame counts). Each
    sampled frame is decoded once to validate it. The real-codec path
    (mp4/webm) swaps ``decode_video`` for an av/ffmpeg call with the
    SAME actor/batch shape — see ``decode_video_frames``."""

    def __init__(self, stride: int = 2, video_col: str = "video"):
        self.stride = max(1, stride)
        self.video_col = video_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # decode_video imported at MODULE top: a runtime relative import
        # here would fail in by-value-shipped workers
        sampled, n_frames, n_sampled, ok = [], [], [], []
        for data in batch[self.video_col].to_pylist():
            try:
                frames = decode_video(data)
                pick = frames[:: self.stride]
                for p in pick:
                    decode_image(p)  # validate each sampled frame
                sampled.append(pick)
                n_frames.append(len(frames))
                n_sampled.append(len(pick))
                ok.append(True)
            except Exception:
                sampled.append([])
                n_frames.append(0)
                n_sampled.append(0)
                ok.append(False)
        return (
            batch.drop_columns([self.video_col])
            .append_column("frames", pa.array(sampled, pa.list_(pa.binary())))
            .append_column("n_frames", pa.array(n_frames, pa.int32()))
            .append_column("n_sampled", pa.array(n_sampled, pa.int32()))
            .append_column("decode_ok", pa.array(ok, pa.bool_()))
        )


class AudioFeatures:
    """Actor stage: int16-PCM audio column → duration / RMS / peak /
    zero-crossing-rate. PCM needs no external decoder, so this stage is
    fully real; a compressed-codec front (mp3/flac) would decode in
    ``__init__``-loaded state with the same batch shape."""

    def __init__(self, sample_rate: int = 16_000, audio_col: str = "audio"):
        self.rate = sample_rate
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, peak, zcr = [], [], [], []
        for data in batch[self.audio_col].to_pylist():
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
            n = len(x)
            dur.append(n / self.rate)
            rms.append(float(np.sqrt((x * x).mean())) if n else 0.0)
            peak.append(float(np.abs(x).max()) if n else 0.0)
            zcr.append(float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 else 0.0)
        return (
            batch.drop_columns([self.audio_col])
            .append_column("duration_s", pa.array(dur, pa.float64()))
            .append_column("rms", pa.array(rms, pa.float64()))
            .append_column("peak", pa.array(peak, pa.float64()))
            .append_column("zcr", pa.array(zcr, pa.float64()))
        )


class AugmentImages:
    """Actor stage: deterministic train-time augmentation — decode →
    seeded per-image transform (horizontal flip and/or crop-to-ratio,
    chosen by a stable hash of image_id so reruns and resumes produce
    byte-identical outputs) → re-encode. Emits the transformed row plus
    an ``aug`` tag column; the original row is NOT kept (callers union
    the source dataset when they want originals + augments).

    Same scale shape as the other binary stages: actor pool, small
    batches, bytes never enter a shuffle."""

    def __init__(self, crop_ratio: float = 0.75, out_fmt: str = "png",
                 seed: int = 13):
        if not 0.0 < crop_ratio <= 1.0:
            raise ValueError("crop_ratio must be in (0, 1]")
        self.crop_ratio = crop_ratio
        self.out_fmt = out_fmt
        self.seed = seed

    def _transform(self, px: np.ndarray, image_id) -> tuple[np.ndarray, str]:
        # stable per-image hash: int ids directly, string ids via crc32
        if isinstance(image_id, (int, np.integer)):
            base = int(image_id)
        else:
            import zlib
            base = zlib.crc32(str(image_id).encode())
        h = (base * 2654435761 + self.seed) % (1 << 32)
        flip = bool(h & 1)
        crop = bool(h & 2)
        tags = []
        if flip:
            px = px[:, ::-1]
            tags.append("flip")
        if crop:
            ch = max(1, int(px.shape[0] * self.crop_ratio))
            cw = max(1, int(px.shape[1] * self.crop_ratio))
            # deterministic corner from the next hash bits
            y0 = ((h >> 2) % (px.shape[0] - ch + 1))
            x0 = ((h >> 12) % (px.shape[1] - cw + 1))
            px = px[y0:y0 + ch, x0:x0 + cw]
            tags.append("crop")
        return np.ascontiguousarray(px), "+".join(tags) or "none"

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, out_w, out_h, tags = [], [], [], []
        for data, iid in zip(batch["bytes"].to_pylist(),
                             batch["image_id"].to_pylist()):
            px, tag = self._transform(decode_image(data), iid)
            out_bytes.append(encode_image(px, self.out_fmt))
            out_h.append(px.shape[0])
            out_w.append(px.shape[1])
            tags.append(tag)
        names = batch.schema.names
        batch = batch.set_column(names.index("bytes"), "bytes",
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index("w"), "w",
                                 pa.array(out_w, pa.int32()))
        batch = batch.set_column(names.index("h"), "h",
                                 pa.array(out_h, pa.int32()))
        batch = batch.set_column(names.index("fmt"), "fmt",
                                 pa.array([self.out_fmt] * len(out_bytes),
                                          pa.string()))
        return batch.append_column("aug", pa.array(tags, pa.string()))


def aspect_bucket_plan(ds, id_col: str, w_col: str, h_col: str,
                       ratios=(0.5, 0.75, 1.0, 4.0 / 3.0, 2.0),
                       batch_size: int = 16, num_partitions: int = 32,
                       n_rows_hint: int | None = None):
    """SDXL-style aspect-ratio bucketing + training-batch assignment:
    each image goes to the bucket of the NEAREST aspect ratio (ties →
    the first, i.e. smaller, ratio), and within each bucket rows are
    ordered by (hash(id), id) — a deterministic pseudo-shuffle — and
    packed into batches of ``batch_size``. Output (id, bucket,
    batch_idx) is the loader plan; the pixel payload never moves.

    One bucket-partitioned metadata exchange (12 B/row); the nearest-
    ratio assign is a vectorized broadcast argmin. SQL replay:
    list_position/list_min over the same double arithmetic +
    row_number() // batch_size."""
    import pandas as pd

    from .grouped import partitioned_apply
    from .sampling import hash_bucket

    r = np.asarray(ratios, dtype=np.float64)

    def assign(batch: "pd.DataFrame") -> "pd.DataFrame":
        a = (batch[w_col].to_numpy(np.float64)
             / batch[h_col].to_numpy(np.float64))
        b = np.argmin(np.abs(a[:, None] - r[None, :]), axis=1) + 1
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame({id_col: ids,
                             "bucket": b.astype("int64"),
                             "hk": hash_bucket(ids, 1 << 32).astype("int64")})

    def pack(p: "pd.DataFrame") -> "pd.DataFrame":
        p = p.sort_values(["bucket", "hk", id_col], kind="mergesort")
        rn = p.groupby("bucket", sort=False).cumcount().to_numpy()
        return pd.DataFrame({
            id_col: p[id_col].to_numpy(),
            "bucket": p["bucket"].to_numpy(),
            "batch_idx": (rn // batch_size).astype("int64"),
        })

    keyed = ds.select_columns([id_col, w_col, h_col]).map_batches(
        assign, batch_format="pandas")
    return partitioned_apply(keyed, ["bucket"], pack, num_partitions,
                             n_rows_hint=n_rows_hint)


# ---------------------------------------------------------------------------
# CLIP-style image/caption alignment gate (LAION-shaped filtering).
#
# The encoder pair is a deterministic stand-in for a trained CLIP (no
# model weights in this container), but it is a REAL aligned codebook,
# not a coin flip: both encoders share the luminance-grid token space
# (g<i>_<q> = "cell i quantizes to level q"), so a caption that truly
# describes its image scores ~1 cosine, a caption describing a
# different/permuted grid scores ~0, and free-text scores ~0. The gate
# therefore has measurable precision/recall, pinned in tests. Swap
# ``ClipScore``'s two embedding calls for a trained model's and every
# other line (actor pool, small batches, score gate) ships unchanged.
# ---------------------------------------------------------------------------

CLIP_GRID = 4  # 4×4 luminance grid → 16-dim embedding space


def _luma_grid_levels(px: np.ndarray, g: int = CLIP_GRID) -> np.ndarray:
    """Quantized luminance grid: mean-pool the image's luma to g×g and
    quantize each cell to 16 levels. Pure, shared by BOTH encoders."""
    luma = px.astype(np.float64).mean(axis=2)
    h, w = luma.shape
    hh, ww = h - h % g, w - w % g
    cells = luma[:hh, :ww].reshape(g, hh // g, g, ww // g).mean(axis=(1, 3))
    return np.clip((cells / 16.0).astype(np.int64), 0, 15).reshape(-1)


def clip_image_embedding(px: np.ndarray, g: int = CLIP_GRID) -> np.ndarray:
    """Image side: centered, L2-normalized quantized-grid vector."""
    v = _luma_grid_levels(px, g) - 7.5
    n = float(np.sqrt((v * v).sum()))
    return v / n if n > 0 else v


def grid_caption(px: np.ndarray, g: int = CLIP_GRID,
                 perm: np.ndarray | None = None) -> str:
    """The caption that truly describes ``px``: one token per grid
    cell. ``perm`` relabels which cell each token claims to describe —
    a deterministic 'wrong caption' with the same token statistics."""
    q = _luma_grid_levels(px, g)
    idx = np.arange(g * g) if perm is None else np.asarray(perm)
    return " ".join(f"g{int(i)}_{int(q[j])}" for i, j in
                    zip(idx, np.arange(g * g)))


def clip_text_embedding(caption: str, g: int = CLIP_GRID) -> np.ndarray:
    """Text side: grid tokens write their (centered) level into their
    claimed dimension; free-text words hash to a signed low-weight
    contribution (so unrelated captions land near zero cosine)."""
    import re as _re
    import zlib as _zlib

    d = g * g
    v = np.zeros(d, dtype=np.float64)
    for tok in (caption or "").split():
        m = _re.fullmatch(r"g(\d+)_(\d+)", tok)
        if m and int(m.group(1)) < d:
            v[int(m.group(1))] += int(m.group(2)) - 7.5
        else:
            h = _zlib.crc32(tok.encode())
            v[h % d] += 0.1 if (h >> 8) & 1 else -0.1
    n = float(np.sqrt((v * v).sum()))
    return v / n if n > 0 else v


class ClipScore:
    """Actor stage: decode → image embedding + caption embedding →
    cosine ``clip_score`` per row. Decode state-free but placed in an
    actor pool like the other decode stages (a real CLIP loads weights
    in ``__init__``). Emits all input columns minus bytes, plus
    clip_score."""

    def __init__(self, grid: int = CLIP_GRID, ndigits: int = 6):
        self.g = grid
        self.ndigits = ndigits

    def __call__(self, batch: pa.Table) -> pa.Table:
        datas = batch["bytes"].to_pylist()
        caps = batch["caption"].to_pylist()
        scores = []
        for data, cap in zip(datas, caps):
            try:
                px = decode_image(data)
            except Exception:
                scores.append(-1.0)
                continue
            iv = clip_image_embedding(px, self.g)
            tv = clip_text_embedding(cap or "", self.g)
            scores.append(sql_round(float(iv @ tv), self.ndigits))
        keep = [c for c in batch.column_names if c != "bytes"]
        return batch.select(keep).append_column(
            "clip_score", pa.array(scores, pa.float64()))


def clip_gate_stats(ds, threshold: float = 0.5, kind_col: str = "cap_kind",
                    batch_size: int = 128, concurrency=None):
    """LAION-shaped alignment filter report: score every (image,
    caption) row with ``ClipScore``, gate at ``threshold``, and report
    per-``kind_col`` row counts / pass counts / mean score. Bytes are
    dropped by the scoring stage, so the tiny combine shuffles metadata
    only."""
    import pandas as pd

    from ..config import auto_concurrency
    from .aggregate import partial_grouped_agg

    scored = ds.map_batches(ClipScore, batch_format="pyarrow",
                            batch_size=batch_size,
                            concurrency=concurrency or auto_concurrency(0.5))

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["passed"] = (batch["clip_score"] >= threshold).astype("int64")
        return batch

    agg = partial_grouped_agg(
        scored.map_batches(flags, batch_format="pandas"),
        [kind_col],
        {"n": ("count", None), "n_pass": ("sum", "passed"),
         "score_sum": ("sum", "clip_score")},
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["mean_score"] = sql_round(batch["score_sum"] / batch["n"], 6)
        return batch.drop(columns=["score_sum"])

    return agg.map_batches(finish, batch_format="pandas")
