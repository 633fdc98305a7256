"""Meteorological scalar functions (SURVEY §2.7 "Domain-derived").

Pure column expressions: every function returns a :class:`Column` built
from JVM-side builtins, so the whole family stays inside whole-stage
codegen — zero Python per row, scale-free.

References (re-expressed, not copied):
  * potential shortwave-in radiation, Stull (1988) p.257 —
    /root/reference/diive/pkgs/createvar/potentialradiation.py:44-77
  * daytime/nighttime flag from SW_IN_POT threshold —
    /root/reference/diive/pkgs/createvar/daynightflag.py:110-134
  * VPD from TA + RH (Magnus form, ReddyProc coefficients) —
    /root/reference/diive/pkgs/createvar/vpd.py:5-49
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

SOLAR_CONSTANT = 1361.0  # W m-2 (potentialradiation.py:36)
DAYS_PER_YEAR = 365.25  # potentialradiation.py:40
SUMMER_SOLSTICE_DOY = 173  # potentialradiation.py:43
TROPIC_CANCER_RAD = 23.45 * math.pi / 180.0  # potentialradiation.py:47


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def swin_pot(
    ts: Column | str,
    lat: float,
    lon: float,
    utc_offset: int = 0,
) -> Column:
    """Potential shortwave-incoming radiation (W m-2) at a timestamp.

    Mirrors ``potrad`` (potentialradiation.py:44-77):
      utc = ts - utc_offset h; hour-fraction + day-of-year drive the solar
      declination ``delta`` and ``sin(psi)``; radiation = S * sin_psi,
      clamped at 0.
    """
    ts = _as_col(ts).cast("timestamp")
    utc = ts - F.expr(f"INTERVAL {int(utc_offset)} HOURS")
    utc_h = F.hour(utc) + F.minute(utc) / 60.0 + F.second(utc) / 3600.0
    utc_doy = F.dayofyear(utc)
    lambda_e = lon * math.pi / 180.0
    phi = lat * math.pi / 180.0
    delta = F.lit(TROPIC_CANCER_RAD) * F.cos(
        F.lit(2.0 * math.pi) * (utc_doy - F.lit(SUMMER_SOLSTICE_DOY)) / F.lit(DAYS_PER_YEAR)
    )
    sin_psi = F.lit(math.sin(phi)) * F.sin(delta) - F.lit(math.cos(phi)) * F.cos(
        delta
    ) * F.cos(F.lit(math.pi) * utc_h / F.lit(12.0) + F.lit(lambda_e))
    return F.greatest(F.lit(0.0), F.lit(SOLAR_CONSTANT) * sin_psi)


def swin_pot_sql(ts_expr: str, lat: float, lon: float, utc_offset: int = 0) -> str:
    """ANSI-SQL twin of :func:`swin_pot` (for DuckDB oracles) — the same
    Stull (1988) expression rendered as portable SQL."""
    utc = f"(({ts_expr}) - INTERVAL {int(utc_offset)} HOUR)"
    h = f"(hour({utc}) + minute({utc}) / 60.0 + second({utc}) / 3600.0)"
    delta = (
        f"({TROPIC_CANCER_RAD!r} * cos(2 * pi() * "
        f"(dayofyear({utc}) - {SUMMER_SOLSTICE_DOY}) / {DAYS_PER_YEAR}))"
    )
    phi = lat * math.pi / 180.0
    lambda_e = lon * math.pi / 180.0
    sin_psi = (
        f"(sin({phi!r}) * sin({delta}) - cos({phi!r}) * cos({delta}) "
        f"* cos(pi() * {h} / 12.0 + {lambda_e!r}))"
    )
    return f"greatest(0.0, {SOLAR_CONSTANT} * {sin_psi})"


def daytime_flag(swinpot: Column | str, nighttime_threshold: float = 50.0) -> Column:
    """1 where SW_IN_POT >= threshold else 0; null stays null
    (daynightflag.py:110-134)."""
    s = _as_col(swinpot)
    return (
        F.when(s >= nighttime_threshold, F.lit(1))
        .when(s < nighttime_threshold, F.lit(0))
        .cast("tinyint")
    )


def nighttime_flag(swinpot: Column | str, nighttime_threshold: float = 50.0) -> Column:
    """Complement of :func:`daytime_flag` (daynightflag.py:128-131)."""
    s = _as_col(swinpot)
    return (
        F.when(s >= nighttime_threshold, F.lit(0))
        .when(s < nighttime_threshold, F.lit(1))
        .cast("tinyint")
    )


def vpd_from_ta_rh(ta: Column | str, rh: Column | str) -> Column:
    """Vapor-pressure deficit in kPa from air temperature (°C) and relative
    humidity (%) — Magnus form with ReddyProc coefficients (vpd.py:40-48):
    ``0.1 * 6.1078 * (1 - RH/100) * exp(17.08085*TA / (234.175+TA))``."""
    ta = _as_col(ta)
    rh = _as_col(rh)
    return (
        F.lit(0.1)
        * F.lit(6.1078)
        * (F.lit(1.0) - rh / F.lit(100.0))
        * F.exp(F.lit(17.08085) * ta / (F.lit(234.175) + ta))
    )


def vpd_sql(ta_expr: str, rh_expr: str) -> str:
    """ANSI-SQL twin of :func:`vpd_from_ta_rh`."""
    return (
        f"0.1 * 6.1078 * (1 - ({rh_expr}) / 100.0) "
        f"* exp(17.08085 * ({ta_expr}) / (234.175 + ({ta_expr})))"
    )
