"""The KG-construction DAG (BASELINE.json north_rule):

transcripts --segment--> sentences --mention detect--> linked mentions
   --predicate match--> evidence --pair within sentence/window--> triples
   --canonicalize (connected components)--> canonical triples
   --materialize (partitioned parquet + per-partition manifests, resumable)

Spark shape of the reference's flagship path (src/srl.py:25-58, SURVEY §3.1):
the Pool(5) chunk fan-out becomes partition parallelism after an explicit
``repartition(hash(conv_id))``; every Mongo round-trip is a broadcast join;
per-chunk stats dicts are ``observe()`` metrics + a manifest table.
"""
