"""Full-analysis orchestration: the reference's ``DataQualityOrchestrator``
recast (``src/data_quality/core/orchestrator.py:39-324`` in /root/reference).

``analyze_table`` = load table -> (optional sample) -> metadata (volumetry +
sampling info + schema snapshot) -> engine fan-out -> summary -> reports,
with constructor injection retained (orchestrator.py:39-66).
"""

from __future__ import annotations

import time
from typing import Any

import ray.data as rd

from .engine import ValidationEngine, default_engine
from .ops.validators import volumetry
from .report import ReportManager, analyze_results


class Orchestrator:
    def __init__(
        self,
        output_dir: str = "reports",
        engine: ValidationEngine | None = None,
        report_manager: ReportManager | None = None,
        sample_size: int | None = 10_000,
    ) -> None:
        self.engine = engine or default_engine()
        self.report_manager = report_manager or ReportManager(output_dir)
        self.sample_size = sample_size

    def analyze_table(self, path: str, table_name: str | None = None) -> dict[str, Any]:
        """Complete analysis -> {results, summary, metadata, duration_s}.

        Sampling follows the reference's rule (orchestrator.py:183-199):
        tables above ``sample_size`` rows are analyzed on a seeded random
        sample; sampling info is recorded in the metadata.
        """
        import os

        name = table_name or os.path.splitext(os.path.basename(path.rstrip("/")))[0]
        t0 = time.time()
        ds = rd.read_parquet(path)
        vol = volumetry(ds)
        total = vol["total_rows"]
        analyzed = total
        if self.sample_size and total > self.sample_size:
            # materialize the (small) sample once — every validator pass
            # would otherwise re-execute read + random_sample from scratch
            ds = ds.random_sample(self.sample_size / total, seed=42).materialize()
            analyzed = ds.count()
        metadata = {
            "table_name": name,
            "volumetry": vol,
            "sampling": {
                "total_rows": total,
                "analyzed_rows": analyzed,
                "sampling_ratio": analyzed / total if total else 1.0,
            },
            "schema": {n: str(t) for n, t in zip(ds.schema().names, ds.schema().types)},
        }
        results = self.engine.validate_data(ds, name)
        summary = analyze_results(results)
        summary["duration_s"] = round(time.time() - t0, 2)
        return {"results": results, "summary": summary, "metadata": metadata}

    def run_complete_analysis(self, path: str, formats: tuple[str, ...] = ("json", "txt", "html")) -> dict[str, Any]:
        out = self.analyze_table(path)
        out["report_paths"] = self.report_manager.generate_unified_report(
            out["results"], out["metadata"]["table_name"], formats
        )
        return out
