"""torch -> flax -> torch state-dict round trip must be the identity."""

import numpy as np
import pytest

from tests.conftest import reference_on_path
from mvster_tpu.tools.convert_torch_ckpt import convert_state_dict, export_state_dict

torch = pytest.importorskip("torch")

HAS_REF = reference_on_path()


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
@pytest.mark.parametrize("overrides", [
    dict(mono=True),
    dict(agg_type="ConvBnReLU3D_CAM", asff=True),
])
def test_roundtrip_identity(overrides):
    from tests.test_model_parity import build_torch_model

    tmodel = build_torch_model(**overrides)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    variables = convert_state_dict(sd)
    back = export_state_dict(variables)

    ref_keys = {k for k in sd if "num_batches_tracked" not in k}
    back_keys = {k for k in back if "num_batches_tracked" not in k}
    assert ref_keys == back_keys, sorted(ref_keys ^ back_keys)[:10]
    for k in ref_keys:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # the exported dict must load strictly into a fresh torch model
    fresh = build_torch_model(**overrides)
    fresh.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in back.items()},
                          strict=True)
