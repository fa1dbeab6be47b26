"""slowfast_feature_extractor_spark — a from-scratch PySpark-native
point-in-time feature-engineering engine.

Reimagines the dual-rate (slow/fast) per-clip feature pipeline of the
reference repo (tamimahm/slowfast_feature_extractor, see SURVEY.md) as a
point-in-time-correct featurizer over web-scale document tables
``(url, warc_ts, html, text, lang)``:

- HTML→text extraction as vectorized Arrow/pandas UDFs
  (``functions.extraction``), byte-identical to the pure-Python oracle;
- SlowFast dual-rate temporal sampling re-expressed as coarse ("slow") +
  fine ("fast") trailing windowed aggregations per entity
  (``operators.windows``), fused via a sort-merge as-of join
  (``operators.asof_join``);
- sessionization by revisit gap (``operators.sessionize``), lag/lead/
  backfill (``operators.windows``), exact resume from a per-partition
  checkpoint ledger (``operators.resume``);
- training-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search (brute-force and
  LSH-bucketed ANN), text analysis (lang-id, quality, tokens,
  fingerprints), multimodal binary-column plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, and join selection; Python appears only as Arrow-batched pandas
UDFs on genuinely non-relational steps (HTML parsing, fixed-length
resampling).
"""

__version__ = "0.1.0"
