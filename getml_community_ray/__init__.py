"""getml_community_ray — a Ray-Data-native time-series rollup / downsample /
retention engine with the query and data-processing capabilities of getML's
community engine (reference: cyclux/getml-community), re-expressed Ray-Data-first.

Layout:
    kernels/    exact aggregation math (vectorized numpy) + scalar oracle
    functions/  scalar column functions (pyarrow.compute wrappers)
    sources/    readers/writers + the deterministic synthetic corpus generator
    stages/     map_batches stages: bucketing, rollup, gap-fill, codecs,
                windows, dedup, text, similarity
    pipelines/  end-to-end pipelines (tiered rollup with retention, FastProp-
                style window features)
    state/      checkpoint manifests with per-partition lineage + metrics

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned by
bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"
