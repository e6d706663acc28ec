"""Extract the reference repo's golden test vectors into tests/fixtures/.

Sources (all public assets of matrix-profile-foundation/matrixprofiler):
* /root/reference/data/motifs_discords_small.rda        — 875-pt input series
* /root/reference/tests/testthat/_snaps/*.md            — testthat snapshots

Output: tests/fixtures/goldens.json — one JSON file holding every golden
vector at full float64 precision (floats are stored via repr, which
round-trips exactly), keyed by kernel name.

Parameter provenance (reference test files):
* windowfunc: w=150                       (test-windowfunc.R:3 etc.)
* mass: w=100, index=100, weights=11:110  (test-mass.R:3-6,48-49); 8-dp JSON
* mpx / mpxab / stamp / stomp / scrimp: w=150, ez=0.5 (test-mpx.R:8-10 …)
* contrast: data1=series[1:400], data2=series[450:750] (R 1-based), w=50
  (test-contrast.R:6-8)
* math: std/znorm/complexity on full series; normalize(series, 1, 5);
  binary_split(50)                        (test-math.R)

Run: python tools/extract_fixtures.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.decode_r import load_rda, parse_snapshot_md, snapshot_value  # noqa: E402

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def parse_printed_r_list(text: str) -> dict:
    """Parse `expect_snapshot` printed output of a named list of vectors.

    Handles blocks like::

        $matrix_profile
          [1]  0.6893843779329555943036  0.687...
        $profile_index
          [1]  99 100 ...
        $partial
        [1] FALSE
        $ez
        [1] 0.5
    """
    out: dict[str, list] = {}
    cur: str | None = None
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"^\$(\w+)$", line)
        if m:
            cur = m.group(1)
            out[cur] = []
            continue
        if cur is None or not line:
            continue
        line = re.sub(r"^\s*\[\d+\]", "", line)
        for tok in line.split():
            if tok == "TRUE":
                out[cur].append(True)
            elif tok == "FALSE":
                out[cur].append(False)
            elif tok in ("Inf", "-Inf", "NA", "NaN"):
                out[cur].append({"Inf": float("inf"), "-Inf": float("-inf")}.get(tok))
            else:
                v = float(tok)
                out[cur].append(int(v) if re.fullmatch(r"-?\d+L?", tok) else v)
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    snaps = REF / "tests/testthat/_snaps"
    g: dict = {}

    series = load_rda(REF / "data/motifs_discords_small.rda")["motifs_discords_small"]
    assert len(series) == 875
    g["series"] = series

    wf = parse_snapshot_md(snaps / "windowfunc.md")
    # block order per test-windowfunc.R: ogita, normal, weighted(8dp json), fading
    for name in ("mov_mean", "mov_var", "mov_sum"):
        blocks = wf[name]
        g[f"{name}_ogita"] = blocks[0]
        g[f"{name}_normal"] = blocks[1]
        g[f"{name}_weighted_8dp"] = snapshot_value(blocks[2])
        g[f"{name}_fading"] = blocks[3]
    g["mov_max"] = wf["mov_max"][0]
    g["mov_min"] = wf["mov_min"][0]
    g["muinvn"] = wf["muinvn"][0]

    mt = parse_snapshot_md(snaps / "math.md")
    g["mode"] = mt["Mode"][0]
    g["std"] = mt["Std"][0][0]
    g["znorm"] = mt["znorm"][0]
    g["normalize_1_5"] = mt["normalize"][0]
    g["complexity"] = mt["complexity"][0][0]
    g["binary_split_50"] = snapshot_value(mt["binary_split"][0])

    ms = parse_snapshot_md(snaps / "mass.md")
    for sec, key in [
        ("Mass normalized", "mass_normalized"),
        ("Mass Non-normalized", "mass_non_normalized"),
        ("Mass Absolute", "mass_absolute"),
        ("Mass Weighted", "mass_weighted"),
    ]:
        dp, lp = ms[sec]
        g[f"{key}_distance_profile_8dp"] = snapshot_value(dp)
        g[f"{key}_last_product_8dp"] = snapshot_value(lp)

    g["mpx"] = parse_snapshot_md(snaps / "mpx.md")["MPX"][0]
    g["mpxab"] = parse_snapshot_md(snaps / "mpx.md")["MPXAB"][0]
    g["stamp"] = parse_snapshot_md(snaps / "stamp.md")["Stamp"][0]
    g["scrimp"] = parse_snapshot_md(snaps / "scrimp.md")["Scrimp"][0]
    g["contrast"] = parse_snapshot_md(snaps / "contrast.md")["Contrast Profile"][0]

    stomp_txt = parse_snapshot_md(snaps / "stomp.md")["Stomp"][0]
    assert isinstance(stomp_txt, str)
    stomp = parse_printed_r_list(stomp_txt)
    stomp["partial"] = stomp["partial"][0]
    stomp["ez"] = stomp["ez"][0]
    assert len(stomp["matrix_profile"]) == 726, len(stomp["matrix_profile"])
    assert len(stomp["profile_index"]) == 726
    g["stomp"] = stomp

    # floats via repr → exact round-trip
    out_path = OUT / "goldens.json"
    out_path.write_text(json.dumps(g))
    print(f"wrote {out_path} ({out_path.stat().st_size} bytes, {len(g)} fixtures)")


if __name__ == "__main__":
    main()
