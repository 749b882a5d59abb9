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


# sample encodings: (format tag, bits) → label. Tag 1 = integer PCM,
# tag 3 = IEEE float (public WAVE_FORMAT_IEEE_FLOAT extension, 1994);
# tag 0xFFFE = WAVE_FORMAT_EXTENSIBLE whose SubFormat GUID leads with the
# real tag.
_ENCODINGS = {(1, 8): "wav_pcm8", (1, 16): "wav_pcm16",
              (1, 24): "wav_pcm24", (3, 32): "wav_f32",
              (3, 64): "wav_f64"}


def encode_wav(samples: np.ndarray, rate: int = 16000,
               fmt: str = "pcm16", extensible: bool = False) -> bytes:
    """samples → RIFF/WAVE bytes (fixture-grade encoder; (n, ch) input
    interleaves channels). ``fmt``: pcm8 | pcm16 | pcm24 | f32 | f64 —
    integer input is taken in that encoding's NATIVE units (pcm8:
    −128..127 signed before the +128 offset; pcm24: ±2^23). ``extensible``
    wraps the format in a WAVE_FORMAT_EXTENSIBLE header (tag 0xFFFE +
    SubFormat GUID), the layout multichannel encoders emit."""
    s = np.asarray(samples)
    channels = 1 if s.ndim == 1 else s.shape[1]
    if fmt == "pcm8":
        data = (s.astype(np.int16) + 128).astype("<u1").tobytes()
        bits, tag = 8, 1
    elif fmt == "pcm16":
        data = s.astype("<i2").tobytes()
        bits, tag = 16, 1
    elif fmt == "pcm24":
        b4 = np.ascontiguousarray(s.astype("<i4")).view(np.uint8)
        data = b4.reshape(-1, 4)[:, :3].tobytes()   # low 3 LE bytes
        bits, tag = 24, 1
    elif fmt == "f32":
        data = s.astype("<f4").tobytes()
        bits, tag = 32, 3
    elif fmt == "f64":
        data = s.astype("<f8").tobytes()
        bits, tag = 64, 3
    else:
        raise ValueError(f"unknown WAV encoding {fmt!r}")
    block = channels * bits // 8
    if extensible:
        guid = struct.pack("<H", tag) + bytes.fromhex(
            "000000001000800000aa00389b71")  # KSDATAFORMAT_SUBTYPE_* base
        fmtc = struct.pack("<HHIIHHHHI", 0xFFFE, channels, rate,
                           rate * block, block, bits, 22, bits, 0) + guid
    else:
        fmtc = struct.pack("<HHIIHH", tag, channels, rate,
                           rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Back-compat alias for the original PCM16-only encoder."""
    return encode_wav(samples, rate, "pcm16")


def decode_wav(buf) -> tuple[int, int, np.ndarray, str]:
    """RIFF/WAVE → (sample_rate, channels, (n, ch) samples, format label).
    Samples keep each encoding's NATIVE dtype/units: pcm8 → int16 in
    −128..127 (offset removed), pcm16 → int16, pcm24 → int32 (±2^23,
    sign-extended), f32/f64 → float. Unknown chunks are skipped
    (word-aligned, per the RIFF spec); EXTENSIBLE headers are unwrapped
    to their SubFormat."""
    data = memoryview(buf).cast("B")
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = tag = None
    raw = None
    while pos + 8 <= len(data):
        cid = bytes(data[pos:pos + 4])
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if tag == 0xFFFE:
                if clen < 26:
                    raise ValueError("WAVE: truncated EXTENSIBLE header")
                (tag,) = struct.unpack_from("<H", body, 24)  # GUID head
            if (tag, bits) not in _ENCODINGS:
                raise NotImplementedError(
                    f"WAVE format tag {tag}/{bits}-bit: not decodable "
                    "without a codec library")
        elif cid == b"data":
            raw = bytes(body)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("WAVE: missing fmt/data chunk")
    label = _ENCODINGS[(tag, bits)]
    if label == "wav_pcm8":
        pcm = np.frombuffer(raw, dtype="<u1").astype(np.int16) - 128
    elif label == "wav_pcm16":
        pcm = np.frombuffer(raw, dtype="<i2")
    elif label == "wav_pcm24":
        b = np.frombuffer(raw, dtype="<u1").reshape(-1, 3).astype(np.int32)
        x = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        pcm = (x ^ 0x800000) - 0x800000            # sign-extend 24→32
    elif label == "wav_f32":
        pcm = np.frombuffer(raw, dtype="<f4")
    else:
        pcm = np.frombuffer(raw, dtype="<f8")
    return int(rate), int(channels), pcm.reshape(-1, channels), label


# full-scale factor converting each encoding's native units into PCM16
# units, so rms/peak are comparable across encodings in a quality gate
_TO_PCM16 = {"wav_pcm8": 256.0, "wav_pcm16": 1.0, "wav_pcm24": 1 / 256.0,
             "wav_f32": 32767.0, "wav_f64": 32767.0}


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
    (RMS, absolute peak, both in PCM16 full-scale units regardless of the
    wire encoding so a quality gate can threshold uniformly) — PCM and
    IEEE-float WAV decode for real; compressed formats yield a 'stubbed'
    row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_META_SCHEMA.fields}
            for key, buf in zip(pdf[key_col], pdf[col]):
                row = dict.fromkeys(out)
                row["url"] = key
                try:
                    rate, ch, pcm, label = decode_wav(buf)
                    n = pcm.shape[0]
                    eq = pcm.astype(np.float64) * _TO_PCM16[label]
                    row.update(
                        format=label, sample_rate=rate, n_channels=ch,
                        n_samples=n,
                        duration_ms=(n * 1000) // rate if rate else 0,
                        rms=float(np.sqrt((eq ** 2).mean())) if n else 0.0,
                        peak=int(round(np.abs(eq).max())) if n else 0)
                except NotImplementedError as e:
                    row.update(format="stubbed", error=str(e))
                except Exception as e:
                    row.update(format="error", error=f"decode: {e}")
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(key_col, col).mapInPandas(fn, AUDIO_META_SCHEMA)
