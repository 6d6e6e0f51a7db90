"""Per-partition lineage + checkpoint manifest for exact resume.

North-rule requirement (SURVEY.md §4.2 "Resume"): every completed unit of
work records ``{unit, input files, fingerprint, rule-hit counts, keep/drop
tallies, output path, status}``; a restarted run loads the manifest, skips
units whose fingerprint still matches, and reprocesses the rest. The unit
is a WAVE: a fixed-size slice of the input shard list processed by one
streaming Dataset execution (outputs land in the wave's own directory, so a
killed run leaves at most one partial wave directory, which is overwritten
on retry).

The reference has no checkpointing at all (SURVEY.md §4.1); this module is
new surface mandated by the north rule.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def input_fingerprint(paths: list[str], config_digest: str) -> str:
    """Hash of (path, size) per input file + rule-config digest + package
    version — the version term invalidates cached waves when the scoring
    CODE changes without a config change (e.g. across build rounds)."""
    from . import __version__

    h = hashlib.sha256(f"{config_digest}:{__version__}".encode())
    for p in sorted(paths):
        h.update(p.encode())
        h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()[:24]


class Manifest:
    """Directory of one JSON record per completed wave."""

    def __init__(self, out_dir: str) -> None:
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, wave_id: int) -> str:
        return os.path.join(self.dir, f"wave-{wave_id:05d}.json")

    def completed(self, wave_id: int, fingerprint: str) -> bool:
        p = self._path(wave_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            return False
        return rec.get("fingerprint") == fingerprint and rec.get("status") == "done"

    def record(
        self,
        wave_id: int,
        fingerprint: str,
        input_paths: list[str],
        output_dir: str,
        stats: dict,
    ) -> None:
        rec = {
            "wave": wave_id,
            "fingerprint": fingerprint,
            "inputs": sorted(input_paths),
            "output_dir": output_dir,
            "stats": stats,
            "status": "done",
            "completed_at": time.time(),
        }
        tmp = self._path(wave_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, self._path(wave_id))  # atomic publish

    def prune(self, expected_waves: int) -> None:
        """Drop records for wave ids beyond the current wave count (stale
        leftovers from a run over a larger corpus in the same out dir)."""
        for name in os.listdir(self.dir):
            if name.startswith("wave-") and name.endswith(".json"):
                wid = int(name[5:-5])
                if wid >= expected_waves:
                    os.remove(os.path.join(self.dir, name))

    def load_all(self) -> list[dict]:
        recs = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    recs.append(json.load(f))
        return recs


def audit(out_dir: str) -> "list[dict]":
    """Verify every manifest record against the bytes on disk — the
    integrity check an operator runs before trusting a resumed output:

    - ``files_ok``: the recorded wave output dir exists and holds parquet;
    - ``rows_ok``: parquet metadata row count (footer-only read, no data
      IO) equals the recorded ``total`` tally;
    - ``inputs_ok``: every recorded input file still exists and is
      readable (full fingerprint equality additionally needs the run's
      config digest, which ``Manifest.completed`` checks at resume time).

    Returns one dict per wave (wave, files_ok, rows_ok, inputs_ok,
    rows_expected, rows_found) ordered by wave id; the driver-side loop is
    O(waves) — the coarse checkpoint unit, never O(rows).
    """
    import glob as _glob

    import pyarrow.parquet as _pq

    reports = []
    man = Manifest(out_dir)
    for rec in sorted(man.load_all(), key=lambda r: r["wave"]):
        files = sorted(_glob.glob(os.path.join(rec["output_dir"], "*.parquet")))
        rows_found = 0
        for f in files:
            rows_found += _pq.ParquetFile(f).metadata.num_rows
        expected = int(rec["stats"].get("total", -1))
        inputs_ok = all(os.path.isfile(p) for p in rec["inputs"])
        reports.append(
            {
                "wave": rec["wave"],
                "files_ok": bool(files),
                "rows_ok": rows_found == expected,
                "inputs_ok": inputs_ok,
                "rows_expected": expected,
                "rows_found": rows_found,
            }
        )
    return reports
