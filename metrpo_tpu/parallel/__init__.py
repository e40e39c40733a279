from metrpo_tpu.parallel.mesh import (DATA_AXIS, ENSEMBLE_AXIS, make_mesh,
                                      replicate_tree, shard_tree_ensemble)
