"""Property test for the multi-format timestamp normalizer, including
the reference's single-digit-minute quirk (Q2) and format dispatch."""

from __future__ import annotations

import random
from datetime import datetime, timezone

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.pipeline.etl import normalize_timestamp
from onechronos_etl_takehome_spark.session import pin_semantics


def _cases():
    rng = random.Random(11)
    cases = []  # (input_string, expected_utc_datetime_or_None)
    for _ in range(60):
        ts = datetime(
            2024,
            rng.randint(1, 12),
            rng.randint(1, 28),
            rng.randint(0, 23),
            rng.randint(0, 59),
            rng.randint(0, 59),
            tzinfo=timezone.utc,
        )
        kind = rng.choice(["iso", "epoch", "us", "us_short"])
        if kind == "iso":
            cases.append((ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"), ts))
        elif kind == "epoch":
            cases.append((str(int(ts.timestamp())), ts))
        elif kind == "us":
            # zero-padded mm:ss → parses
            s = f"{ts.month}/{ts.day}/{ts.year} {ts.hour}:{ts.minute:02d}:{ts.second:02d}"
            cases.append((s, ts))
        else:
            # single-digit minute → quirk Q2: falls through to the
            # patternless parse and becomes NULL
            if ts.minute < 10:
                s = f"{ts.month}/{ts.day}/{ts.year} {ts.hour}:{ts.minute}:{ts.second:02d}"
                cases.append((s, None))
    cases += [("garbage", None), ("", None), (None, None)]
    return cases


def test_normalize_timestamp_model(spark):
    pin_semantics(spark)  # UTC session → expected values are true UTC
    cases = _cases()
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i int, ts string"
    ).select("i", normalize_timestamp(F.col("ts")).alias("norm"))
    got = {r.i: r.norm for r in df.collect()}
    for i, (raw, expected) in enumerate(cases):
        g = got[i]
        if expected is None:
            assert g is None, (raw, g)
        else:
            assert g is not None, (raw, expected)
            assert g.replace(tzinfo=timezone.utc) == expected, (raw, g, expected)
