"""Multi-chip parallelism: mesh construction, partition rules, sharded
scoring/top-k.  See sessionrec_tpu.parallel.mesh and .sharded."""
