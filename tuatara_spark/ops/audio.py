"""Audio-column operators: PCM WAV decode + metadata/feature extraction.

Clean-room RIFF/WAVE PCM parser from the public WAVE format spec
(Microsoft/IBM 1991 multimedia programming interface, RIFF chunk layout) —
pure struct + NumPy, no codec library. This un-stubs the audio modality
for its simplest real container; compressed codecs (MP3/AAC/opus) remain
explicit stubs (no codec library exists in this container —
ops/multimodal.py pattern).

Spark surface mirrors the image ops: payloads ride as ``binary`` columns,
decode + features run Arrow-batched in ``mapInPandas``, malformed payloads
become error rows, never failed tasks.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (FloatType, IntegerType, LongType, StringType,
                               StructField, StructType)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono/int16 samples → RIFF/WAVE PCM bytes (fixture-grade encoder;
    (n, ch) input interleaves channels)."""
    s = np.asarray(samples)
    channels = 1 if s.ndim == 1 else s.shape[1]
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, channels, (n, ch) int16 array).
    Unknown chunks are skipped (word-aligned, per the RIFF spec)."""
    data = memoryview(buf).cast("B")
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        cid = bytes(data[pos:pos + 4])
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if tag != 1:
                raise NotImplementedError(
                    f"WAVE format tag {tag}: only PCM (1) is decodable "
                    "without a codec library")
            if bits != 16:
                raise NotImplementedError("only 16-bit PCM supported")
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAVE: missing fmt/data chunk")
    return int(rate), int(channels), pcm.reshape(-1, channels)


AUDIO_META_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("format", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", LongType()),
    StructField("rms", FloatType()),
    StructField("peak", IntegerType()),
    StructField("error", StringType()),
])


def extract_audio_meta(df: DataFrame, col: str = "html",
                       key_col: str = "url") -> DataFrame:
    """Decode audio payloads → typed metadata + cheap signal features
    (RMS, absolute peak) — the filters an audio-corpus quality gate uses.
    PCM WAV decodes for real; compressed formats yield a 'stubbed' row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_META_SCHEMA.fields}
            for key, buf in zip(pdf[key_col], pdf[col]):
                row = dict.fromkeys(out)
                row["url"] = key
                try:
                    rate, ch, pcm = decode_wav(buf)
                    n = pcm.shape[0]
                    row.update(
                        format="wav_pcm16", sample_rate=rate, n_channels=ch,
                        n_samples=n,
                        duration_ms=(n * 1000) // rate if rate else 0,
                        rms=float(np.sqrt(
                            (pcm.astype(np.float64) ** 2).mean())) if n else 0.0,
                        peak=int(np.abs(pcm).max()) if n else 0)
                except NotImplementedError as e:
                    row.update(format="stubbed", error=str(e))
                except Exception as e:
                    row.update(format="error", error=f"decode: {e}")
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(key_col, col).mapInPandas(fn, AUDIO_META_SCHEMA)
