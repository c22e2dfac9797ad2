"""sbustreamspot_core_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch (NOT a port) with the query/data-processing capabilities
of the reference StreamSpot core (``/root/reference``, see SURVEY.md):

- typed edge-table data model over Arrow (`sources/edges.py`)
- shingle feature extraction (F1), multilinear hashing (H1), StreamHash
  sketches (H4/H5), SimHash (H7/H8), LSH banding + co-bucket clustering
  (C1-C4) — `stages/shingle.py`, `functions/hashing.py`, `stages/sketch.py`,
  `stages/lsh.py`
- incremental nearest-centroid clustering / anomaly scoring re-expressed as
  windowed mini-batch dataflow (C5/C6) — `pipelines/streamspot.py`
- the north-star link-graph algorithms (PageRank, connected components,
  label propagation, triangle counting) on a shared superstep engine —
  `pipelines/superstep.py`
- large-scale training-data ops: dedup family, ANN, text analysis,
  multimodal plumbing — `stages/dedup.py`, `stages/ann.py`,
  `stages/text.py`, `stages/multimodal.py`

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, actor pools for stateful stages, groupby-aggregate
shuffles for the wide steps.
"""

__version__ = "0.1.0"
