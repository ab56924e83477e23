"""S7/S8 export + retention and the cron-shaped schedule surface."""

from __future__ import annotations

import json
import os
import re

from auto_ria_spark.sources.warehouse import Warehouse, cleanup_old_dumps
from auto_ria_spark.streaming.schedule import fire_times, next_daily_fire
from auto_ria_spark.util import local_df


def test_export_dump_roundtrip_and_retention(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    t = wh.table("cars")
    df = local_df(spark, [(f"u{i}", i) for i in range(20)],
                  "url string, price int")
    t.write(df, mode="overwrite", tag={"wave": 0})

    dumps = str(tmp_path / "dumps")
    os.makedirs(dumps)
    ts0 = 1_700_000_000
    p_old = t.export_dump(spark, dumps, ts0)
    p_new = t.export_dump(spark, dumps, ts0 + 40 * 86400)
    assert p_old and p_new and p_old != p_new
    # the dump is self-contained and re-readable
    back = spark.read.parquet(p_new)
    assert back.count() == 20
    assert sorted(back.columns) == ["price", "url"]
    mf = json.load(open(os.path.join(p_new, "_MANIFEST.json")))
    assert mf["table"] == "cars"
    # retention: 30-day horizon drops the old dump only
    # (reference: app/utils/db_dumper.py:105-148)
    removed = cleanup_old_dumps(dumps, now_ts=ts0 + 40 * 86400)
    assert removed == 1
    assert not os.path.exists(p_old) and os.path.exists(p_new)


def test_daily_crontab_fires_dst_correct():
    """Reference schedule: daily crontab at a fixed Europe/Kiev wall time
    (app/config/celery_config.py:50,60-69).  Across the 2025-10-26 DST
    fall-back the UTC gap between consecutive fires changes from 24 h to
    25 h while local wall time stays 06:00 — the crontab semantics."""
    # 2025-10-24 00:00 UTC .. 2025-10-28 00:00 UTC spans the transition
    start, end = 1_761_264_000, 1_761_609_600
    fires = fire_times(start, end, hour=6, minute=0)
    assert len(fires) == 4
    gaps = [b - a for a, b in zip(fires, fires[1:])]
    assert 25 * 3600 in gaps and gaps.count(24 * 3600) == len(gaps) - 1
    from datetime import datetime
    from zoneinfo import ZoneInfo
    kyiv = ZoneInfo("Europe/Kiev")
    assert all(datetime.fromtimestamp(f, kyiv).strftime("%H:%M") == "06:00"
               for f in fires)
    # strictly-after semantics
    assert next_daily_fire(fires[0], 6, 0) == fires[1]


def test_iceberg_ddl_matches_engine_schemas():
    """The production DDL must accept the engine's frames column-for-column
    (name, order, and type up to the spark<->iceberg long/bigint spelling)."""
    from auto_ria_spark.plans import crawl as C
    from auto_ria_spark.sources.warehouse import iceberg_ddl

    engine = {
        "frontier": C.FRONTIER_LOG_SCHEMA,
        "seen_urls": C.SEEN_SCHEMA,
        "pending_cars": C.PENDING_LOG_SCHEMA,
        "cars": C.CARS_SCHEMA,
        "car_images": C.CAR_IMAGES_SCHEMA,
        "saved_hashes": C.SAVED_HASHES_SCHEMA,
        "host_state": C.HOSTSTATE_SCHEMA,
        "metrics": C.METRICS_SCHEMA,
    }

    def cols(schema: str) -> list[tuple[str, str]]:
        out = []
        for part in schema.split(","):
            name, typ = part.strip().split(" ", 1)
            out.append((name, {"long": "bigint"}.get(typ.strip(),
                                                     typ.strip())))
        return out

    ddl = iceberg_ddl()
    for table, schema in engine.items():
        body = re.search(r"\((.*)\)\s*USING", ddl[table]).group(1)
        assert cols(body) == cols(schema), table
