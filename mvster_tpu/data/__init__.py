from mvster_tpu.data.registry import find_dataset_def, register_dataset
from mvster_tpu.data.pfm import read_pfm, write_pfm
from mvster_tpu.data.loader import MVSLoader

# register built-in datasets
from mvster_tpu.data import dtu, general_eval, blendedmvs, tanks, eth3d  # noqa: F401
