#!/usr/bin/env python3
"""Generate the deterministic clinical fixture + golden outputs.

1. Writes users.csv / weights.csv / treatments.csv to fixtures/clinical/
   honoring FIXTURES.md (schema, 1:many keys, unique sort keys, a couple
   of odd-time-of-day rows to pin down day-diff semantics, null
   Wts_UpdatedDate rows for the WIR non-null count, one exact duplicate
   row pair for dedup).
2. Runs the REFERENCE pipeline (/root/reference/pandas_DataModel.py,
   executed as-is, not copied) on the fixture for several configs and
   writes canonical golden CSVs to fixtures/clinical/golden/.

Run from /root/repo: python3 tools/gen_clinical_fixture.py
"""
import os, sys, random
import pandas as pd
import numpy as np

OUT = "fixtures/clinical"
os.makedirs(OUT, exist_ok=True)
rng = random.Random(42)

BASE = pd.Timestamp("2023-04-16 18:54:42")
FMT = "%Y-%m-%d %H:%M:%S"

users, weights, treatments = [], [], []
N_USERS = 30
for i in range(N_USERS):
    uid = f"u{i:04d}-{rng.randrange(16**8):08x}"
    gender = "Male" if i % 2 == 0 else "Female"
    age = [15, 17, 18, 25, 40, 55, 72, 75][i % 8]
    clinic = 5066 if i % 3 != 2 else 5067
    created = BASE + pd.Timedelta(minutes=i)
    users.append(dict(
        UID=uid, Name=f"Name{i}", LastName=f"Last{i}", Gender=gender,
        Unit=1, Birthday=(BASE - pd.Timedelta(days=365 * age)).strftime(FMT),
        Age=age, Height=150 + i, CreatedDate=created.strftime(FMT),
        IsActive=True, ClinicID=clinic, loginId="", success=True))

    n_treat = 2 if i % 5 == 0 else 1
    for t in range(n_treat):
        tstart = created + pd.Timedelta(days=45 * t)
        treatments.append(dict(
            MasterUserID=uid, TreatmentTypeID=1 + (i + t) % 3,
            StartDate=tstart.strftime(FMT)))
        n_weigh = 6 + (i + t) % 9
        w0 = 70.0 + (i % 40) + 10 * t
        for k in range(n_weigh):
            # distinct day offsets → unique sort keys within the user
            wc = tstart + pd.Timedelta(days=3 * k + (k % 2))
            if i == 7 and k == 2:
                # odd time-of-day: exercises pandas floor-toward--inf
                # day-diff vs naive datediff
                wc = wc - pd.Timedelta(hours=20)
            upd = "" if (i + k) % 11 == 3 else wc.strftime(FMT)
            wt = round(w0 - 0.4 * k + 0.3 * ((i * 7 + k * 13) % 5), 1)
            weights.append(dict(
                MasterUserID=uid, Weight=wt, BMI=round(wt / 2.9, 1),
                BodyFat=round(20 + (k % 7), 1), BodyWater=55.0, Bone=2.9,
                VisceralFat=9.7, BMR=1500.0, MuscleMass=47.4,
                CreatedDate=wc.strftime(FMT), UpdatedDate=upd,
                IsActive=True, IsDelete=False))
        if i == 10 and t == 0:
            weights.append(dict(weights[-1]))  # exact duplicate row → dedup

pd.DataFrame(users).to_csv(f"{OUT}/users.csv", index=False)
pd.DataFrame(weights).to_csv(f"{OUT}/weights.csv", index=False)
pd.DataFrame(treatments).to_csv(f"{OUT}/treatments.csv", index=False)
print(f"fixture: {len(users)} users, {len(weights)} weights, {len(treatments)} treatments")

# ---- golden outputs from the reference implementation ----
sys.path.insert(0, "/root/reference")
from pandas_DataModel import data_pipeline  # noqa: E402

CONFIGS = [
    ("default_week", dict(cohort="week", gender="all", min_age=18, max_age=72, ClinicID=5066)),
    ("male_u18_week", dict(cohort="week", gender="Male", min_age=18, max_age=18, ClinicID=5066)),
    ("female_month", dict(cohort="month", gender="Female", min_age=10, max_age=80, ClinicID=5066)),
    ("clinic_cohort", dict(cohort="ClinicID", gender="all", min_age=10, max_age=80, ClinicID=5067)),
]

GOLD = f"{OUT}/golden"
os.makedirs(GOLD, exist_ok=True)
KEEP = ["UID", "Gender", "Age", "ClinicID", "Weight", "Wts_CreatedDate",
        "month", "week", "WIR", "PSW", "TSW", "treatment_TBWL", "patient_TBWL"]
for name, kw in CONFIGS:
    df = data_pipeline(OUT, **kw)
    out = df[KEEP].copy()
    for c in ["Weight", "PSW", "TSW", "treatment_TBWL", "patient_TBWL"]:
        out[c] = out[c].round(6)
    out = out.sort_values(by=KEEP).reset_index(drop=True)
    out.to_csv(f"{GOLD}/{name}.csv", index=False)
    print(f"golden {name}: {len(out)} rows")
