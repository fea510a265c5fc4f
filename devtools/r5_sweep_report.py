#!/usr/bin/env python
"""Assemble devtools/SWEEP_r05.md from a finished r5_sweep.sh output dir.

Parses each leg's log for its JSON line / headline stats and emits the
round-5 sweep table with zero TBD rows, plus copies the raw JSON artifacts
into devtools/sweep_r05/ so the numbers survive the round snapshot.

Usage: python devtools/r5_sweep_report.py [/tmp/r5_sweep]
"""

import json
import re
import shutil
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5_sweep")
DEST = HERE / "sweep_r05"
DEST.mkdir(exist_ok=True)

LEGS = [
    "od_cold", "od_warm", "tripwire_f64", "bench_pallas", "bench_b100k",
    "bench_encke", "example01_tpu", "example02_tpu", "example03_drift",
    "example03_raise", "example03_sk", "example04_tpu", "example04_cpu",
    "example05_tpu", "example06_tpu",
]


def last_json(text):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def wall_of(text):
    m = re.findall(r"real\s+(\d+)m([\d.]+)s", text)
    if m:
        mm, ss = m[-1]
        return int(mm) * 60 + float(ss)
    return None


rows = []
for leg in LEGS:
    p = OUT / f"{leg}.log"
    if not p.exists():
        rows.append((leg, "MISSING", "", ""))
        continue
    text = p.read_text(errors="replace")
    # commit the raw log alongside the parsed row (cold walls, tripwire
    # output); drop the multi-KB XLA cpu_aot_loader feature-list warnings
    kept = [ln for ln in text.splitlines() if len(ln) < 1500]
    (DEST / f"{leg}.log").write_text("\n".join(kept) + "\n")
    wall = wall_of(text)
    js = last_json(text)
    note = ""
    if js:
        (DEST / f"{leg}.json").write_text(json.dumps(js, indent=1) + "\n")
        if "value" in js:
            note = f"{js['value']} {js.get('unit', '')}"
            if js.get("od_filter_steps_per_s"):
                note += f"; OD {js['od_filter_steps_per_s']} steps/s"
    for pat, label in [
        (r"OD_STEPS_PER_S=([\d.]+)", "OD steps/s"),
        (r"OD_FLAGSHIP_STEPS_PER_S=([\d.]+)", "flagship steps/s"),
        (r"filter rate \(warm\): (\d+)", "filter steps/s"),
        (r"final position error: ([\d.]+ m)", "final err"),
        (r"f64-sublane tripwire \[\w+\]: (OK[^(]*)", "tripwire"),
        (r"(\d+/\d+ trajectories completed in [\d.]+s)", "MC"),
        (r"total ([\d.]+)s \(reference", "total s"),
        (r"SK MC: (\d+ runs x \d+ d in [\d.]+ s)", "SK"),
        (r"GEO drift (\d+ d in [\d.]+ s)", "drift"),
        (r"day\s+(\d+): sma\s+4\d{4}", "raise reached GEO day"),
        (r"OD done: (\d+ accepted, \d+ rejected)", "OD"),
        (r"RIC position error \(m\): (\[[^\]]*\])", "RIC err m"),
        (r"(\d+) apoapsis passages", "apoapses"),
    ]:
        m = re.search(pat, text)
        if m:
            note += f"; {label} {m.group(1)}" if note else f"{label} {m.group(1)}"
    tail = text[-2000:]
    ok = "ok" if ("Traceback" not in text and "rc=1" not in tail) else "CHECK"
    rows.append((leg, ok, f"{wall:.0f}s" if wall else "", note))

md = ["# Round-5 TPU sweep\n",
      f"Source logs: {OUT} (copied JSON artifacts: devtools/sweep_r05/)\n",
      "| leg | status | wall | headline |",
      "|---|---|---|---|"]
for leg, ok, wall, note in rows:
    md.append(f"| {leg} | {ok} | {wall} | {note} |")
notes = HERE / "sweep_r05_notes.md"
if notes.exists():
    md += ["", notes.read_text().rstrip()]
(HERE / "SWEEP_r05.md").write_text("\n".join(md) + "\n")
print(f"wrote {HERE / 'SWEEP_r05.md'}")
for leg, ok, wall, note in rows:
    print(f"{leg:18s} {ok:7s} {wall:8s} {note}")
