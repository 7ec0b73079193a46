"""osm_addr_bot_spark — a PySpark-native spatial-join + tiling engine.

Re-implements the query semantics of the reference changeset-validation
bot (Zaczero/osm-addr-bot, read-only at /root/reference) as an idiomatic
Spark DataFrame program over an Iceberg-style table of interleaved
text+media documents:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

The reference compiles every spatial operator to OverpassQL and lets a
remote server execute it (reference overpass.py:92-151). This engine
internalizes those operators as native Spark stages:

  * duplicate-address radius join (100 m)  -> hex-cell k-ring hash join
  * place containment / proximity (10 km)  -> cell-cover PIP + radius join
  * tiered street-name search (0.5/1/3 km) -> anti-join cascade
  * historical guilt diff                  -> snapshot join + map diff
  * raster tile assignment                 -> native XYZ slippy-map exprs

plus a training-data-pipeline suite (dedup, similarity search, text
analysis, multimodal plumbing) under `datapipe/`.

Design rules (see SURVEY.md):
  - DataFrame/SQL first; Catalyst does pushdown/pruning/join selection.
  - Python only in vectorized pandas/Arrow UDFs (cell math, PIP refine).
  - Explicit partitioning: spatial shuffles key on cell ids, skewed
    urban cells are salted, small dims are broadcast.
"""

__version__ = "0.1.0"
