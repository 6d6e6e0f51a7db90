"""rayquality — a Ray-Data-native streaming quality-filter / data-quality engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``MateusFenoci/mysql-data-quality`` (see SURVEY.md), re-expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines of vectorized ``map_batches``
kernels over zero-copy Arrow batches, actor pools for stateful model stages,
explicit shuffle/skew handling for dedup, and per-partition lineage for
resumable runs.

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"
