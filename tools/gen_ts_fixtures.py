#!/usr/bin/env python3
"""One-off generator for the committed events ts-encoding fixtures.

The driver has regenerated /root/testdata events.parquet with different
Parquet timestamp encodings across rounds (TIMESTAMP(NANOS) through
round 6, TIMESTAMP(MICROS) from round 7). `graft.queries.Tables` must
load both, so we commit one tiny fixture per encoding and pin them in
`EventsEncodingSpec`. Driver-side tooling only — the Scala library never
depends on this script or on pyarrow.

Usage: python3 tools/gen_ts_fixtures.py
Writes: src/test/resources/events_nanos.parquet
        src/test/resources/events_micros.parquet
"""
import pyarrow as pa
import pyarrow.parquet as pq

rows = {
    "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    # Distinct hours + one sub-second value to pin truncation behavior.
    "ts_us": [
        1704067200_000000,      # 2024-01-01T00:00:00
        1704067200_123456,      # 2024-01-01T00:00:00.123456
        1704070800_000000,      # 2024-01-01T01:00:00
        1704074400_500000,      # 2024-01-01T02:00:00.5
        1704078000_999999,      # 2024-01-01T03:00:00.999999
    ],
    "user_id": pa.array([10, 10, 11, 12, 10], type=pa.int64()),
    "event_type": pa.array(["click", "view", "click", "buy", "view"]),
    "value": pa.array([1.5, 2.0, 0.5, 9.99, 3.25], type=pa.float64()),
    "props": pa.array(['{"a":1}', '{"a":2}', '{}', '{"b":"x"}', '{"a":3}']),
}

def table(ts_type):
    unit = {"us": 1, "ns": 1000}[ts_type.unit]
    ts = pa.array([v * unit for v in rows["ts_us"]], type=pa.int64()).cast(ts_type)
    return pa.table({
        "event_id": rows["event_id"],
        "ts": ts,
        "user_id": rows["user_id"],
        "event_type": rows["event_type"],
        "value": rows["value"],
        "props": rows["props"],
    })

pq.write_table(table(pa.timestamp("ns")), "src/test/resources/events_nanos.parquet",
               use_deprecated_int96_timestamps=False, coerce_timestamps=None,
               store_schema=False)
pq.write_table(table(pa.timestamp("us")), "src/test/resources/events_micros.parquet",
               store_schema=False)

for f in ("events_nanos", "events_micros"):
    s = pq.read_schema(f"src/test/resources/{f}.parquet")
    print(f, s.field("ts").type)
