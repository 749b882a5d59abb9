"""Shared decode-safety limits for the clean-room codecs."""

from __future__ import annotations


# Adversarial-header guard shared by the ref codecs: a crawl payload
# whose header CLAIMS billions of pixels would OOM / CPU-starve an
# executor before any data-length check fires (u16 dims alone allow
# 65535² = 12 GB). 2^26 px (64 MP) is far above any sane page scan.
MAX_PIXELS = 1 << 26


def check_dims(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"{what}: implausible dimensions {w}x{h}")
