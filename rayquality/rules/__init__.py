"""Vectorized rule kernels.

Each kernel follows the reference's "rule -> per-row mask -> affected/total
tally" shape (``src/data_quality/validators/`` in /root/reference) but
computes the mask as one numpy/Arrow pass over a batch, never a Python loop
over rows.
"""
