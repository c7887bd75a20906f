from mvster_tpu.utils.profiling import Timer, device_memory_stats, trace
from mvster_tpu.utils.debug import DebugDumper
from mvster_tpu.utils.seeding import set_random_seed
