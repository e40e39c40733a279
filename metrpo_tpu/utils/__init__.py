from metrpo_tpu.utils.replay import ReplayDataset, combine_replay_datasets
from metrpo_tpu.utils.normalizer import RunningStats, running_stats_init, running_stats_update
from metrpo_tpu.utils.prng import KeySequence
from metrpo_tpu.utils.tabular import TabularLogger, get_logger
