"""kazu_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of AstraZeneca/KAZU
(reference at /root/reference, EMNLP 2022 industry track) as
``ray.data.Dataset`` pipelines:

* documents flow as Arrow record batches (``map_batches(batch_format="pyarrow")``)
* stateful stages (string matcher, TF-IDF linker) are actor pools whose
  state is built once per actor from broadcast ontology cache tables
* document-scoped logic (mapping/disambiguation, abbreviation expansion,
  overlap merging, triple emission) runs in ``groupby("doc_id").map_groups``
* wide steps (canonical-id aggregation, final triple sort) are explicit
  shuffles with documented partitioning keys.

Nothing is copied from the reference; file:line citations in docstrings
point at the behaviour each component reproduces.
"""

__version__ = "0.1.0"
