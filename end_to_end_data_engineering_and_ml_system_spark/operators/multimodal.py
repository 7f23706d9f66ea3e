"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata structs.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` batch shape, Arrow transfer of binary columns. The actual
media decode is stubbed: the container ships no image/audio libraries, so
``decode_media_features`` uses a deterministic byte-level fake (normalized
byte histogram) and ``decode_image_real`` raises ``NotImplementedError``
pointing at where a real decoder (PIL/torchvision/ffmpeg) plugs in. At
100 TB the payloads stay in executor memory one Arrow batch at a time; only
fixed-width features leave the operator.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16


def payload_from_text(text: Column | str) -> Column:
    """Stand-in binary payload (UTF-8 bytes of the text column) — the fixture
    tables have no media blobs, so documents.text doubles as payload bytes."""
    c = F.col(text) if isinstance(text, str) else text
    return F.encode(c, "UTF-8")


def with_media_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Attach the typed metadata struct every multimodal column carries:
    (mime, n_bytes, checksum). Cheap, JVM-side, computed once at ingest."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("checksum"),
        ),
    )


def decode_media_features(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """STUB decode → feature-extract over ``mapInPandas``.

    Real pipelines replace the histogram with an image decode + model
    embedding; the signature, schema, and Arrow batch shape stay identical.
    The fake is deterministic: normalized byte-value histogram with
    ``N_HIST_BINS`` bins.
    """
    import numpy as np

    schema = (
        f"{id_col} bigint, n_bytes bigint, "
        f"features array<double>"
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            sizes = []
            for blob in pdf[payload_col]:
                # NULL payloads arrive as None — bytes(None) would kill
                # the whole job; treat as empty (all-zero features)
                arr = np.frombuffer(
                    b"" if blob is None else bytes(blob), dtype=np.uint8
                )
                sizes.append(len(arr))
                if len(arr) == 0:
                    feats.append([0.0] * N_HIST_BINS)
                    continue
                hist, _ = np.histogram(arr, bins=N_HIST_BINS, range=(0, 256))
                feats.append((hist / len(arr)).tolist())
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_bytes": sizes, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def decode_image_real(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Where a real image decoder plugs in (PIL/torchvision are not in this
    container). Kept as an explicit, clearly-marked stub."""
    raise NotImplementedError(
        "real image decode requires PIL/torchvision; use decode_media_features "
        "for the deterministic fake with the identical plan shape"
    )


def frame_sample(
    df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 64
) -> DataFrame:
    """Frame-sampling analog for video payloads: take one 'frame' (byte
    chunk) every ``every_n_bytes``, exploded to (id, frame_no, frame_bytes)
    with ``frame_bytes`` BINARY. JVM-side substring arithmetic — no Python.

    The slice runs on the binary column directly: the old
    ``cast("string")`` round-trip decoded the payload as UTF-8 (garbage
    for real media bytes) and sliced by CHARACTERS while the frame count
    was computed in BYTES — silently misaligned frames on any multi-byte
    content."""
    n_frames = F.floor(F.octet_length(F.col(payload_col)) / every_n_bytes).cast(
        "int"
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    frames = F.transform(
        idx,
        lambda i: F.substring(
            F.col(payload_col), i * every_n_bytes + 1, every_n_bytes
        ),
    )
    return df.select(
        id_col, F.posexplode(frames).alias("frame_no", "frame_bytes")
    )


def pcm_rms_energy(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_samples: int = 256,
) -> DataFrame:
    """REAL audio-shaped decode (no external codec needed): interpret the
    binary payload as little-endian int16 PCM and emit per-frame RMS energy
    — the standard VAD / silence-trim / loudness-normalization primitive.

    Unlike the image path (which needs PIL and stays a declared stub), raw
    PCM is just bytes: the decode is ``np.frombuffer`` inside the same
    Arrow-batched ``mapInPandas`` shape, so this operator exercises the
    full multimodal contract — binary column in, fixed-width numeric
    features out, payloads never leaving executor memory — with genuine
    signal math. A trailing odd byte is dropped (int16 alignment); the
    tail frame shorter than ``frame_samples`` is kept and normalized by
    its true length.
    """
    import numpy as np

    schema = f"{id_col} bigint, frame_no int, n_samples int, rms double"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, frame_nos, ns, rmss = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = b"" if blob is None else bytes(blob)
                samples = np.frombuffer(
                    raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
                ).astype(np.float64)
                if samples.size == 0:
                    continue
                for fno in range(0, samples.size, frame_samples):
                    frame = samples[fno : fno + frame_samples]
                    ids.append(rid)
                    frame_nos.append(fno // frame_samples)
                    ns.append(int(frame.size))
                    rmss.append(float(np.sqrt(np.mean(frame * frame))))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def pcm_frame_energy(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_samples: int = 256,
) -> DataFrame:
    """Integer-exact sibling of :func:`pcm_rms_energy`: the same Arrow-batched
    little-endian int16 PCM decode and framing, but the per-frame statistic
    is the raw sum of squared samples as a BIGINT — exact in int64 (a frame
    of 256 int16 samples sums to at most 256·32768² ≈ 2.7e11 « 2^63), so
    the result is bit-identical across engines and SQL-expressible: the
    engine-portable oracle reconstructs the identical integers from byte
    arithmetic. RMS is a sqrt away downstream; keeping the operator output
    integral moves the only float to the consumer. Framing contract matches
    pcm_rms_energy exactly (trailing odd byte dropped, short tail frame
    kept with its true n_samples)."""
    import numpy as np

    schema = f"{id_col} bigint, frame_no int, n_samples int, sumsq bigint"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, frame_nos, ns, sums = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = b"" if blob is None else bytes(blob)
                samples = np.frombuffer(
                    raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
                ).astype(np.int64)
                if samples.size == 0:
                    continue
                for fno in range(0, samples.size, frame_samples):
                    frame = samples[fno : fno + frame_samples]
                    ids.append(rid)
                    frame_nos.append(fno // frame_samples)
                    ns.append(int(frame.size))
                    sums.append(int((frame * frame).sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "sumsq": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
