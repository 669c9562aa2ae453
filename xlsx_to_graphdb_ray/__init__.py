"""xlsx_to_graphdb_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch rebuild of the data-processing capabilities of
``Cars-10/xlsx_to_graphdb`` (see /root/repo/SURVEY.md for the structural
analysis): extract -> resolve -> canonicalize -> materialize (subj, pred, obj)
triples, re-expressed as streaming ``ray.data.Dataset`` pipelines over
multi-turn conversation/agent transcript Parquet tables
``(conv_id, turn_idx, role, text, tool, ts)``.

Package layout:

- ``functions/``  — scalar/vectorized kernels (normalization, hashing, text).
- ``sources/``    — readers (transcripts, reference-shaped tabular fixtures).
- ``stages/``     — pipeline stages, each ``Dataset -> Dataset``.
- ``pipelines/``  — end-to-end compositions + report queries.
- ``state/``      — checkpoint / lineage-manifest helpers.
- ``synth.py``    — deterministic transcript/entity generator (test + bench input).

No module in this package calls ``ray.init()`` / ``ray.shutdown()``; the
driver (or ``bench.py`` / the pytest session fixture) owns the Ray session.
"""

__version__ = "0.1.0"
