"""Deterministic reference-shaped fixtures (FIXTURES.md §1-§2).

Seeded synthetic breadcrumb_raw / stop_event_raw records with every
edge case SURVEY.md §5 calls out: unparseable OPD_DATE, ACT_TIME
clamping and Δt=0 duplicates, GPS nulls, corrupt-row quota for the
quarantine tests, multi-day / multi-dow coverage.
"""

from __future__ import annotations

import json
import random
from datetime import date, timedelta

N_TRIPS = 20
PINGS_PER_TRIP = 40
BASE_DATE = date(2023, 1, 9)  # Monday; 14-day span covers every dow


def breadcrumb_raw_records(seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    records: list[dict] = []
    for t in range(N_TRIPS):
        trip_id = 238330000 + t
        vehicle_id = 3000 + (t % 7)
        day = BASE_DATE + timedelta(days=t % 14)
        opd = day.strftime("%d%b%Y").upper() + ":00:00:00"
        meters = 0
        act = 6 * 3600 + (t % 5) * 3600
        for p in range(PINGS_PER_TRIP):
            meters += rng.randint(0, 40)  # includes ΔM=0
            if p == 7:
                act += 0  # Δt=0 division edge
            else:
                act += 5
            rec = {
                "EVENT_NO_TRIP": trip_id,
                "EVENT_NO_STOP": trip_id + 100,
                "OPD_DATE": opd,
                "VEHICLE_ID": vehicle_id,
                "METERS": meters,
                "ACT_TIME": act,
                "GPS_LONGITUDE": -122.5 + rng.uniform(-0.2, 0.2),
                "GPS_LATITUDE": 45.5 + rng.uniform(-0.1, 0.1),
                "GPS_SATELLITES": rng.randint(0, 12),
                "GPS_HDOP": round(rng.uniform(0.5, 2.5), 2),
            }
            if p == 3:  # GPS null pair (P5 fillna path)
                rec["GPS_LATITUDE"] = None
                rec["GPS_LONGITUDE"] = None
            records.append(rec)
        # one ACT_TIME>86399 clamp row per trip (F3)
        records.append({**records[-1], "ACT_TIME": 90000, "METERS": meters + 10})
    # ~1% unparseable OPD_DATE (F1 coerce path)
    records.append({**records[0], "OPD_DATE": "NOTADATE:00:00:00"})
    return records


def corrupt_breadcrumb_records() -> list[dict]:
    """P16 corrupt quota: one row per violated rule."""
    base = breadcrumb_raw_records()[0]
    return [
        {**base, "VEHICLE_ID": -1},
        {**base, "ACT_TIME": -5},
        {**base, "GPS_LATITUDE": 95.0},
        {**base, "GPS_LONGITUDE": -200.0},
        {**base, "EVENT_NO_TRIP": 0},
        {**base, "METERS": -10},
    ]


def write_breadcrumb_landing(dirpath, records, files: int = 4) -> None:
    """One JSON-lines file per 'vehicle' (S4 landing layout)."""
    per = (len(records) + files - 1) // files
    for i in range(files):
        chunk = records[i * per : (i + 1) * per]
        if not chunk:
            continue
        with open(f"{dirpath}/bus_{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")


STOP_EVENT_HTML = """
<html><body><h1>Stop events for vehicle 3001</h1>
<table>
<tr><th>vehicle_number</th><th>leave_time</th><th>train</th><th>route_number</th>
<th>direction</th><th>service_key</th><th>trip_number</th><th>stop_time</th>
<th>arrive_time</th><th>dwell</th><th>location_id</th><th>door</th><th>lift</th>
<th>ons</th><th>offs</th><th>estimated_load</th><th>maximum_speed</th>
<th>train_mileage</th><th>pattern_distance</th><th>location_distance</th>
<th>x_coordinate</th><th>y_coordinate</th><th>data_source</th><th>schedule_status</th></tr>
<tr><td>3001</td><td>25000</td><td>1</td><td>20</td><td>0</td><td>W</td>
<td>238330000</td><td>24980</td><td>24950</td><td>50</td><td>9000</td><td>2</td>
<td>0</td><td>3</td><td>1</td><td>low</td><td>35</td><td>1200.5</td><td>800</td>
<td>20</td><td>7650123</td><td>655321</td><td>1</td><td>0</td></tr>
<tr><td>3001</td><td>25600</td><td>1</td><td>20</td><td>1</td><td>S</td>
<td>238330001</td><td>25580</td><td>25550</td><td>50</td><td>9001</td><td>2</td>
<td>1</td><td>5</td><td>0</td><td></td><td>40</td><td>1300.5</td><td>900</td>
<td>25</td><td>7650456</td><td>655654</td><td>1</td><td>0</td></tr>
<tr><td>badid</td><td>100</td><td>1</td><td>20</td><td>2</td><td>X</td>
<td>238330002</td><td>90</td><td>200</td><td>-5</td><td>9002</td><td>2</td>
<td>0</td><td>0</td><td>0</td><td>huge</td><td>85</td><td>1.0</td><td>1</td>
<td>1</td><td>1</td><td>1</td><td>1</td><td>0</td></tr>
</table></body></html>
"""
