"""Ray-Data-native telemetry symbolication engine.

A from-scratch re-expression of the capabilities of
honeycombio/opentelemetry-collector-symbolicator (three OpenTelemetry
collector processors: sourcemapprocessor / proguardprocessor /
dsymprocessor) as a streaming Ray Data pipeline over Parquet tables of
pre-tokenized training sequences.

Architecture (see SURVEY.md):
  read_parquet -> map_batches(decode tokens -> log record) ->
  salted repartition by debug-id -> actor-pool symbolizer chain
  (sourcemap / proguard / dsym lookups behind per-actor LRU caches) ->
  map_batches(re-encode) -> per-sink parquet writers + per-sink
  groupby aggregate, with per-partition checkpoint lineage.
"""

__version__ = "0.1.0"
