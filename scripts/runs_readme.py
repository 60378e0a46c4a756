"""Regenerate results/tpu_runs/README.md from the JSON artifacts.

The r3/r4 READMEs were edited by hand and rotted twice (the committed
"best" lagged the artifacts by 12%). This script is the only writer:
it scans every ``results/tpu_runs/*.json``, renders one table row per
artifact from the file's own fields, and states the best verified
headline. Run it after adding any artifact:

    python scripts/runs_readme.py
"""

import json
import os
import sys

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "tpu_runs")


def _fmt(x, nd=2):
    return f"{x:.{nd}f}" if isinstance(x, (int, float)) else "-"


def _row_driver(name, doc):
    d = doc.get("detail") or {}
    val = doc.get("value")
    merged = d.get("merged") or {}
    big = d.get("big_design") or {}
    headline = (f"{_fmt(val)} steps/s" if isinstance(val, (int, float))
                else "null")
    notes = []
    if d.get("compute_dtype"):
        notes.append(d["compute_dtype"])
    if d.get("packing"):
        notes.append(f"packing={d['packing']}")
    if isinstance(d.get("mfu"), (int, float)):
        notes.append(f"MFU {d['mfu'] * 100:.1f}%")
    if isinstance(merged.get("steps_per_sec"), (int, float)):
        mmfu = merged.get("mfu")
        if isinstance(mmfu, (int, float)) and mmfu > 1.0:
            # pre-gate (r2-r4) artifact: its merged loop never fetched a
            # value, so aborted dispatches timed as successes — the
            # merged/MFU fields are the retracted broken-clock numbers.
            # The HEADLINE value in the same file is valid (that loop
            # always fetched the loss per trial).
            notes.append(f"merged RETRACTED pre-gate broken clock "
                         f"(claimed MFU {mmfu * 100:.0f}%)")
        else:
            notes.append(f"merged {merged['steps_per_sec']:.1f} sps"
                         + (f" (MFU {mmfu * 100:.1f}%)"
                            if isinstance(mmfu, (int, float)) else ""))
    if isinstance(big.get("steps_per_sec"), (int, float)):
        notes.append(f"big {big['steps_per_sec']:.1f} sps "
                     f"({big.get('packing')})")
    if isinstance(d.get("headline_f32_steps_per_sec"), (int, float)):
        notes.append(f"f32 A/B {d['headline_f32_steps_per_sec']:.1f}")
    if d.get("error"):
        notes.append(f"ERROR: {d['error'][:60]}")
    return "full bench", headline, ", ".join(notes) or "-", val


def _row_point(name, doc):
    pt = doc["point"]
    sps = None
    notes = []
    if pt == "headline":
        sps = doc.get("tpu_sps")
        for k in ("dtype", "packing"):
            if doc.get(k):
                notes.append(f"{k}={doc[k]}")
        if doc.get("gnn_batched"):
            notes.append("gnn_batched")
        if not doc.get("flat_adam", True):
            notes.append("per-leaf adam")
        if doc.get("inf_dps"):
            notes.append(f"{doc['inf_dps']:.0f} designs/s inference")
    elif pt == "merged":
        sps = doc.get("merged_sps")
        notes.append(f"packing={doc.get('packing')}")
        if sps and doc.get("merged_xla_flops"):
            notes.append(
                f"{doc['merged_xla_flops'] * sps / 1e12:.2f} TFLOP/s")
    elif pt == "big":
        sps = doc.get("big_sps")
        notes.append(f"packing={doc.get('packing')}")
        if doc.get("nodes"):
            notes.append(f"{doc['nodes']} nodes")
    if doc.get("rejected"):
        notes.append(f"REJECTED: {doc['rejected']}")
    if doc.get("sps_trials"):
        notes.append(f"trials {doc['sps_trials']}")
    headline = f"{_fmt(sps)} steps/s" if sps else "null"
    return f"{pt} point", headline, ", ".join(notes) or "-", None


def main():
    rows = []
    best = None  # (value, file) over driver-form headline values only
    for name in sorted(os.listdir(RUNS)):
        if not name.endswith(".json"):
            continue
        path = os.path.join(RUNS, name)
        try:
            with open(path) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, OSError):
            rows.append((name, "unparseable", "-", "truncated/invalid JSON"))
            continue
        if not isinstance(doc, dict):
            rows.append((name, "unknown", "-", "-"))
            continue
        if "point" in doc:
            kind, headline, notes, _ = _row_point(name, doc)
        elif doc.get("metric") == "train_steps_per_sec":
            kind, headline, notes, val = _row_driver(name, doc)
            if isinstance(val, (int, float)) and (
                    best is None or val > best[0]):
                best = (val, name)
        else:
            kind, headline, notes = "unknown", "-", "-"
        rows.append((name, kind, headline, notes))

    lines = [
        "# TPU-window bench runs",
        "",
        "Raw `bench.py` JSON artifacts captured during TPU tunnel",
        "windows — full driver-form runs (`{\"metric\": ...}` lines) and",
        "single-point child runs (`{\"point\": ...}`), unedited. This",
        "table is GENERATED from the files by `scripts/runs_readme.py`;",
        "do not edit it by hand (the r3/r4 hand-edited versions rotted",
        "against their own artifacts twice).",
        "",
        "| file | kind | headline | notes |",
        "|---|---|---|---|",
    ]
    for name, kind, headline, notes in rows:
        lines.append(f"| `{name}` | {kind} | {headline} | {notes} |")
    lines.append("")
    if best:
        lines.append(
            f"Best verified full-bench headline: **{best[0]:.2f} steps/s**"
            f" (`{best[1]}`). Headline values are valid across all rounds"
            " (that loop always fetched the loss per timed trial);"
            " merged/MFU fields in pre-gate (r2-r4) artifacts are the"
            " retracted broken-clock numbers and are flagged per-row"
            " above.")
    lines.append("")
    lines.append("Regenerate with `python scripts/runs_readme.py`.")
    out = os.path.join(RUNS, "README.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} artifacts)", file=sys.stderr)


if __name__ == "__main__":
    main()
