"""TPU-native Model-Ensemble TRPO (ME-TRPO) framework.

A from-scratch JAX/XLA re-design of the capabilities of thanard/me-trpo
(arXiv 1802.10592).  The dynamics ensemble is a vmapped parameter stack
trained in one jitted step, imagined rollouts are ``lax.scan`` programs
stepping batched particles through sampled ensemble members entirely on
device, and TRPO's natural-gradient update (CG Fisher-vector products +
KL backtracking line search) runs as a single jitted program.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"
