"""Deterministic OpenAQ-shaped NDJSON fixtures (FIXTURES.md §5).

Generates a miniature lake exercising every tricky semantic in the
reference surface: latest-per-key dedup, multi-day snapshots with
metadata drift, the locality COALESCE chain, empty/missing sensor
arrays, out-of-range + flagged + null-flag measurements, orphan
sensors, sub-hourly timestamps across hour boundaries, late data and
corrupt lines. Seeded, no randomness at all — values are enumerated.
"""

from __future__ import annotations

import json
import os

RUN1 = "scheduled__2026-01-02T06:00:00+00:00"
RUN2 = "scheduled__2026-01-03T06:00:00+00:00"

SENSORS_L1 = [
    {"id": 11, "name": "pm25", "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"}},
    {"id": 12, "name": "temp", "parameter": {"id": 100, "name": "temperature", "units": "c"}},
    {"id": 13, "name": "rh", "parameter": {"id": 98, "name": "relativehumidity", "units": "%"}},
]
SENSORS_L2 = [
    {"id": 21, "name": "pm10", "parameter": {"id": 1, "name": "pm10", "units": "µg/m³"}},
    {"id": 22, "name": "winddir", "parameter": {"id": 22, "name": "winddirection", "units": "deg"}},
]


def _loc(id, name, locality, city, tz, country, lat, lon, sensors):
    return {
        "id": id,
        "name": name,
        "locality": locality,
        "city": city,
        "timezone": tz,
        "country": {"code": country[0], "name": country[1]},
        "coordinates": {"latitude": lat, "longitude": lon},
        "provider": {"name": "AirNow"},
        "isMobile": False,
        "isMonitor": True,
        "sensors": sensors,
    }


def location_rows() -> list[dict]:
    rows = []

    def audit(run_id, date, extracted_at, fname):
        return {
            "_audit_run_id": run_id,
            "_audit_logical_date": date,
            "_audit_extracted_at": extracted_at,
            "_audit_source": "OpenAQ API",
            "_audit_gcs_filename": fname,
        }

    # L1 day1: duplicate extraction — later extracted_at must win (W1)
    l1 = _loc(1, "Del Norte", "Albuquerque", None, "America/Denver",
              ("US", "United States"), 35.1353, -106.5847, SENSORS_L1)
    rows.append({"data": l1, **audit(RUN1, "2026-01-02", "2026-01-02T06:00:01Z", "f1")})
    l1_newer = dict(l1, name="Del Norte v2")
    rows.append({"data": l1_newer, **audit(RUN1, "2026-01-02", "2026-01-02T07:00:01Z", "f2")})
    # L1 day2: metadata drift (SCD-1 should pick this one)
    l1_d2 = dict(l1, name="Del Norte v3")
    rows.append({"data": l1_d2, **audit(RUN2, "2026-01-03", "2026-01-03T06:00:01Z", "f3")})

    # L2: null locality, non-null city (fallback #2)
    l2 = _loc(2, "Station Two", None, "Madrid", "Europe/Madrid",
              ("ES", "Spain"), 40.4168, -3.7038, SENSORS_L2)
    rows.append({"data": l2, **audit(RUN1, "2026-01-02", "2026-01-02T06:00:02Z", "f1")})

    # L3: locality+city both null, underscore timezone (fallback #3 → "New York")
    l3 = _loc(3, "Station Three", None, None, "America/New_York",
              ("US", "United States"), 40.7128, -74.0060, [])  # empty sensors → explode drops
    rows.append({"data": l3, **audit(RUN1, "2026-01-02", "2026-01-02T06:00:03Z", "f1")})

    # L4: missing sensors key entirely (null array)
    l4 = _loc(4, "Station Four", "Lyon", None, "Europe/Paris",
              ("FR", "France"), 45.7640, 4.8357, None)
    del l4["sensors"]
    rows.append({"data": l4, **audit(RUN1, "2026-01-02", "2026-01-02T06:00:04Z", "f1")})
    return rows


def measurement_rows() -> list[dict]:
    rows = []

    def m(sensor_id, pid, value, ts_from, has_flags=False, date="2026-01-02",
          extracted="2026-01-02T06:10:00Z", run_id=RUN1, interval="01:00:00"):
        data = {
            "value": value,
            "parameter": {"id": pid, "name": "p%d" % pid, "units": "u"},
            "period": {
                "datetimeFrom": {"utc": ts_from},
                "datetimeTo": {"utc": ts_from},
                "interval": interval,
            },
        }
        if has_flags is not None:
            data["flagInfo"] = {"hasFlags": has_flags}
        else:
            data["flagInfo"] = {}
        return {
            "data": data,
            "_audit_run_id": run_id,
            "_audit_sensor_id": sensor_id,
            "_audit_logical_date": date,
            "_audit_extracted_at": extracted,
            "_audit_gcs_filename": "m1",
        }

    # sensor 11 (pm25): sub-hourly across an hour boundary → two hourly buckets
    rows.append(m(11, 2, 9.4, "2026-01-02T13:05:00Z"))
    rows.append(m(11, 2, 10.6, "2026-01-02T13:45:00Z"))
    rows.append(m(11, 2, 12.0, "2026-01-02T14:10:00Z"))
    # duplicate measurement re-extracted later (W1: value 99 must win)
    rows.append(m(11, 2, 9.4, "2026-01-02T13:05:00Z", extracted="2026-01-02T05:10:00Z"))
    rows.append(m(11, 2, 99.0, "2026-01-02T13:05:00Z", extracted="2026-01-02T07:10:00Z"))
    # out-of-range pm25 (negative → dropped by P5)
    rows.append(m(11, 2, -5.0, "2026-01-02T15:05:00Z"))
    # flagged row (dropped by P4) and null-flag row (dropped: null-rejecting =)
    rows.append(m(11, 2, 50.0, "2026-01-02T16:05:00Z", has_flags=True))
    rows.append(m(11, 2, 60.0, "2026-01-02T17:05:00Z", has_flags=None))
    # sensor 12 (temperature): valid negatives, out-of-range −100
    rows.append(m(12, 100, -10.0, "2026-01-02T13:20:00Z"))
    rows.append(m(12, 100, -100.0, "2026-01-02T13:40:00Z"))
    rows.append(m(12, 100, 21.5, "2026-01-02T14:00:00Z"))
    # sensor 13 (humidity): 140 out of range
    rows.append(m(13, 98, 55.0, "2026-01-02T13:30:00Z"))
    rows.append(m(13, 98, 140.0, "2026-01-02T13:50:00Z"))
    # sensor 22 (wind dir): 400 out of range, 360 boundary valid
    rows.append(m(22, 22, 360.0, "2026-01-02T13:15:00Z"))
    rows.append(m(22, 22, 400.0, "2026-01-02T13:25:00Z"))
    # sensor 21 (pm10) day2
    rows.append(m(21, 1, 30.0, "2026-01-03T09:10:00Z", date="2026-01-03",
                  extracted="2026-01-03T06:10:00Z", run_id=RUN2))
    # orphan sensor 99: no location parent (RI failure, dropped by J2)
    rows.append(m(99, 2, 5.0, "2026-01-02T13:35:00Z"))
    return rows


def write_lake(root: str) -> dict[str, str]:
    """Write the NDJSON lake (with one corrupt + one blank line) and
    return {'locations': glob, 'measurements': glob}."""
    loc_dir = os.path.join(root, "locations", "2026", "01", "02")
    mea_dir = os.path.join(root, "measurements", "2026", "01", "02")
    os.makedirs(loc_dir, exist_ok=True)
    os.makedirs(mea_dir, exist_ok=True)

    loc_path = os.path.join(loc_dir, "locations_part0.ndjson")
    with open(loc_path, "w", encoding="utf-8") as f:
        for row in location_rows():
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
        f.write("\n")  # blank line → skipped
        f.write("{not valid json]\n")  # corrupt line → skipped

    mea_path = os.path.join(mea_dir, "measurements_part0.ndjson")
    with open(mea_path, "w", encoding="utf-8") as f:
        for row in measurement_rows():
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
        f.write("[1, 2, 3]\n")  # non-dict record → skipped

    return {
        "locations": os.path.join(root, "locations", "*", "*", "*", "*.ndjson"),
        "measurements": os.path.join(root, "measurements", "*", "*", "*", "*.ndjson"),
    }
