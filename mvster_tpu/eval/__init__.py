from mvster_tpu.eval.dtu_metric import (
    evaluate_scan,
    aggregate_stats,
    reduce_points,
    nn_distances,
)
