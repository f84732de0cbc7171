from .sharded import (make_mesh, shard_domain, gf_scalar, stage_lde,
                      stage_commit, stage_composition, stage_deep,
                      stage_fri_fold, dryrun_prove_core)
