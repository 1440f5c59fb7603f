"""Production-shape partition specs compile on the virtual mesh.

The tiny multichip dryrun proves the sharded step runs; this proves the
specs stay valid at PRODUCTION shape (scan-stacked (L, ...) leaves,
int8 weight + scale pairs, quantized KV) — the leaves a tiny tree never
exercises.  Caught for real: the lm_head vocab-sharding rule is
ill-formed at the actual vocab (32001 % 4 != 0); param_shardings now
falls back to replication on any unevenly-tiled dimension.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from mraudio_tpu.config import MeshConfig
from mraudio_tpu.parallel import make_mesh, param_shardings


def test_uneven_dims_fall_back_to_replication():
    mesh = make_mesh(MeshConfig(data=2, model=4), devices=jax.devices()[:8])
    tree = {
        "llm": {
            "lm_head": {"kernel": jax.ShapeDtypeStruct((4096, 32001), np.float32)},
            "layer_0": {"self_attn": {"q_proj": {
                "kernel": jax.ShapeDtypeStruct((4096, 4096), np.float32)}}},
        }
    }
    sh = param_shardings(tree, mesh)
    assert sh["llm"]["lm_head"]["kernel"].spec == P(None, None)  # 32001 % 4
    assert sh["llm"]["layer_0"]["self_attn"]["q_proj"]["kernel"].spec == P(None, "model")


@pytest.mark.slow
def test_fullsize_specs_compile_on_virtual_mesh():
    import __graft_entry__ as g

    stats = g.dryrun_fullsize_specs(8, kv_quant="int8")
    assert stats["train"]["params"] > 7_000_000_000
    assert stats["train"]["compile_s"] > 0
    assert stats["generate"]["kv_quant"] == "int8"
