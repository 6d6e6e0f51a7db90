.PHONY: test gate bench scaling analyze-example filter-example

test:
	python -m pytest tests/ -x -q

# local simulation of the driver's correctness gate (DuckDB oracles)
gate:
	python scripts/check_driver.py /root/testdata/sf0.01

bench:
	python bench.py

scaling:
	python bench.py --scaling

analyze-example:
	python -m rayquality.cli analyze /root/testdata/sf0.01/orders.parquet --output-dir /tmp/rayquality_reports

filter-example:
	python -c "from rayquality import synth; print(synth.ensure_corpus(10_000))"
	python -m rayquality.cli filter /tmp/rayquality_synth/n10000_s42

filter-docs-example:
	python -m rayquality.cli filter-docs /root/testdata/sf0.01/documents.parquet --output-dir /tmp/rayquality_docq_out
