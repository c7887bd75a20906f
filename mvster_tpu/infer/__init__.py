from mvster_tpu.infer.fusion import fuse_scene, geometric_filter
from mvster_tpu.infer.ply import write_ply, read_ply
