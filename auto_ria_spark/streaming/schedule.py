"""Cron-shaped scheduling surface — the reference's Celery beat analogue.

The reference fires one crawl per day via a crontab in the Europe/Kiev
timezone (reference: app/config/celery_config.py:60-69, timezone at :50).
The engine's continuous mode already has AvailableNow / processingTime
triggers (streaming/continuous.py); this module adds the cron-shaped
schedule: given a wall-clock window, compute the exact epoch instants a
``crontab(hour=H, minute=M)`` would fire, DST-correct via zoneinfo — the
driver (or an external scheduler) sleeps until each fire and runs
``CrawlEngine.run``/``resume``.

Pure functions of their inputs (no wall clock) so tests are deterministic.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

try:
    from zoneinfo import ZoneInfo
    _KYIV = ZoneInfo("Europe/Kiev")
except Exception:  # pragma: no cover - tzdata always ships in this image
    _KYIV = timezone(timedelta(hours=3))


def next_daily_fire(after_epoch: int, hour: int, minute: int,
                    tz=_KYIV) -> int:
    """Epoch seconds of the first ``HH:MM`` local-time fire strictly after
    ``after_epoch`` (the reference's daily crontab semantics)."""
    now = datetime.fromtimestamp(after_epoch, tz)
    cand = now.replace(hour=hour, minute=minute, second=0, microsecond=0)
    if cand <= now:
        # normalize through date arithmetic so a DST jump lands on the
        # correct local wall time, not a fixed 24 h offset
        cand = (cand + timedelta(days=1)).replace(hour=hour, minute=minute)
    return int(cand.timestamp())


def fire_times(start_epoch: int, end_epoch: int, hour: int, minute: int,
               tz=_KYIV) -> list[int]:
    """All daily fire instants in (start, end] — the schedule a driver
    loop (or Structured Streaming processingTime trigger wrapper) walks."""
    out: list[int] = []
    t = start_epoch
    while True:
        t = next_daily_fire(t, hour, minute, tz)
        if t > end_epoch:
            return out
        out.append(t)
