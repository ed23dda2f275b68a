"""Host-streamed minibatch path (SURVEY §2.6 host data layer; ref DataLoader
semantics psvi_classes.py:810-821): the train set stays in host RAM and each
chained dispatch ships only its batch stack. Batch selection uses the SAME
PRNG keys as the device-resident path, so the two modes must be bit-identical.
"""

import numpy as np
import pytest

from psvi_tpu.data.datasets import DataBundle
from psvi_tpu.inference.psvi import PSVI


def _bundle(n=256, d=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    w = rng.standard_normal(d).astype(np.float32)
    y = (x @ w > 0).astype(np.int32)
    return DataBundle(x, y, x[:64], y[:64], n, d, 2)


CFG = dict(
    method="psvi_learn_v", num_pseudo=6, mc_samples=4, inner_it=3,
    num_epochs=8, log_every=4, data_minibatch=32, seed=0,
)


@pytest.mark.parametrize("trainer", ["nested", "joint"])
def test_stream_equals_resident(trainer):
    data = _bundle()
    res_resident = PSVI(data, trainer=trainer, **CFG).run_psvi()
    res_stream = PSVI(data, trainer=trainer, stream_data=True,
                      **CFG).run_psvi()
    np.testing.assert_allclose(
        res_stream["accs"], res_resident["accs"], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        res_stream["nlls"], res_resident["nlls"], rtol=1e-6
    )


def test_stream_train_set_stays_on_host():
    data = _bundle()
    eng = PSVI(data, stream_data=True, **CFG)
    assert isinstance(eng.x_train, np.ndarray)
    eng.run_psvi()
    assert isinstance(eng.x_train, np.ndarray)


def test_stream_rejects_increment():
    data = _bundle()
    with pytest.raises(ValueError, match="stream_data"):
        PSVI(data, stream_data=True, increment=True,
             increment_interval=2, increment_sizes=(4, 6), **CFG)
