"""Device-mesh parallelism.

The reference's only multi-device story is single-process
``torch.nn.DataParallel`` scatter/gather over 1-3 local GPUs
(``/root/reference/two_stage_ADMM_Online_FastDVD_Warm.py:241``,
``packages/DDnet/train_DDnet.py:53-58``); there is no distributed backend at
all (SURVEY §2.7). The TPU-native equivalent is one
``jax.sharding.Mesh`` with axes ``('data', 'frame')``:

  * **data** (DP): scenes / measurements / training batches shard across
    chips (DCN across hosts, ICI within a pod); gradient sync and metric
    reduction are XLA ``psum`` collectives inserted automatically under
    ``jit`` with sharded inputs — replacing DataParallel's scatter/gather.
  * **frame** (sequence/temporal parallel): the B-frame video cube shards
    over chips; the 5-frame sliding-window denoisers exchange 2-frame halos
    with ring ``ppermute`` over ICI (:mod:`.halo`) — the convolutional
    analogue of ring attention, replacing the reference's per-frame Python
    loops.

TP/PP/EP are not required for parity (nothing in the reference is tensor- or
pipeline-parallel and there is no MoE); the elementwise solver state and the
small CNN priors make DP x frame-sharding the bandwidth-optimal layout.
"""

from adaptivepnp_sci_tpu.parallel.mesh import make_mesh  # noqa: F401
from adaptivepnp_sci_tpu.parallel.halo import halo_windows  # noqa: F401
