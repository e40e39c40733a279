"""Natural policy gradient (NPG): TRPO's natural-gradient step WITHOUT the
backtracking line search — theta <- theta - sqrt(2 delta / sHs) * H^-1 g.

The reference's ``algos/npg.py`` is an empty placeholder (SURVEY.md 2.16);
this is the working in-tree version, expressed as TRPO with a single
forced-accept "backtrack" so the two share one implementation.
"""

from __future__ import annotations

import dataclasses

from metrpo_tpu.algos.baselines import LinearFeatureBaseline
from metrpo_tpu.algos.trpo import make_trpo_update
from metrpo_tpu.config import TrpoParams
from metrpo_tpu.models.policy import GaussianMLPPolicy


def make_npg_update(policy: GaussianMLPPolicy, cfg: TrpoParams,
                    baseline: LinearFeatureBaseline | None = None,
                    jit: bool = True):
    # max_backtracks=1 with backtrack_ratio irrelevant: the first (full)
    # step is taken if it improves the surrogate within the KL region;
    # otherwise no update — the conservative NPG variant.
    npg_cfg = dataclasses.replace(cfg, max_backtracks=1)
    return make_trpo_update(policy, npg_cfg, baseline, jit=jit)
