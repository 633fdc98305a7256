"""Engine configuration dataclasses: retention tiers and resample policy."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TierSpec:
    """One retention tier of the continuous-aggregate cascade.

    Mirrors the reference's multi-resolution resample family
    (/root/reference/diive/core/times/resampling.py:13-132 re-run per tier;
    /root/reference/diive/core/dfun/frames.py:323-393 for the label/closed
    policy per frequency class).
    """

    name: str  # e.g. "1m", "1h", "1d"
    duration: str  # Spark interval string, e.g. "1 minute"
    seconds: int  # bucket width in seconds (for bucket expressions)
    mincounts_perc: float = 0.9  # resampling.py:16 default
    retention_buckets: int | None = None  # expire windows older than N buckets


DEFAULT_TIERS: tuple[TierSpec, ...] = (
    TierSpec("1m", "1 minute", 60),
    TierSpec("1h", "1 hour", 3600),
    TierSpec("1d", "1 day", 86400),
)


@dataclass(frozen=True)
class EngineConfig:
    key_col: str = "url"
    ts_col: str = "ts"
    value_col: str = "value"
    tiers: tuple[TierSpec, ...] = field(default=DEFAULT_TIERS)
    # source data resolution (seconds) for END->MIDDLE conversion; None = raw
    source_freq_seconds: int | None = None
