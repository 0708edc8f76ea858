from gandes_tpu.core.rng import Sampler, spawn_node_seeds
from gandes_tpu.core.eventlog import EventLog, LOG_PREFIX
