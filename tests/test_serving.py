"""StreamingPredictor: micro-batching, padding, per-task routing."""

import copy

import jax
import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.serving import StreamingPredictor
from fmc_uia_tpu.tasks import TaskRegistry
from tests.helpers import TINY_CONFIG

S = 64


@pytest.fixture(scope="module")
def service():
    cfg = Config(config_dict=copy.deepcopy(TINY_CONFIG))
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 2)
    svc = StreamingPredictor(
        model, variables["params"], reg,
        mean=[0.33] * 3, std=[0.18] * 3, image_size=S,
        max_batch=4, max_delay_ms=5.0)
    yield svc
    svc.close()


def test_single_requests_all_task_types(service):
    rng = np.random.RandomState(0)
    futs = {
        "T2A_organ_a": service.submit(
            rng.randint(0, 255, (S, S, 3), dtype=np.uint8), "T2A_organ_a"),
        "T1_planes": service.submit(
            rng.randint(0, 255, (S, S, 3), dtype=np.uint8), "T1_planes"),
        "T4_box": service.submit(
            rng.randint(0, 255, (S, S, 3), dtype=np.uint8), "T4_box"),
        "T5_points": service.submit(
            rng.randint(0, 255, (S, S, 3), dtype=np.uint8), "T5_points"),
    }
    seg = futs["T2A_organ_a"].result(timeout=120)
    assert seg.shape == (S, S)  # class-id mask
    cls = futs["T1_planes"].result(timeout=120)
    assert cls.shape == () and 0 <= int(cls) < 3
    box = futs["T4_box"].result(timeout=120)
    assert box.shape == (4,)
    pts = futs["T5_points"].result(timeout=120)
    assert pts.ndim == 1 and pts.shape[0] >= 4


def test_batch_of_many_requests(service):
    rng = np.random.RandomState(1)
    futs = [service.submit(
        rng.randint(0, 255, (S, S, 3), dtype=np.uint8), "T1_planes")
        for _ in range(11)]  # 2 full batches of 4 + padded tail of 3
    results = [f.result(timeout=120) for f in futs]
    assert len(results) == 11
    assert all(0 <= int(r) < 3 for r in results)


def test_validation_errors(service):
    with pytest.raises(KeyError):
        service.submit(np.zeros((S, S, 3), np.uint8), "nope")
    with pytest.raises(ValueError):
        service.submit(np.zeros((S + 1, S, 3), np.uint8), "T1_planes")


def test_autoscale_lone_request_runs_small_batch(service):
    """With autoscale on (default), a lone request must dispatch at a
    chain size below max_batch (1), not padded to max_batch=4."""
    before = dict(service.stats["by_size"])
    fut = service.submit(np.zeros((S, S, 3), np.uint8), "T2A_organ_a")
    fut.result(timeout=120)
    after = service.stats["by_size"]
    assert after[1] > before.get(1, 0)
    assert service._chain == [1, 2, 4]


def test_autoscale_off_pads_to_max_batch():
    from fmc_uia_tpu.serving import StreamingPredictor
    import copy
    from fmc_uia_tpu.config import Config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from tests.helpers import TINY_CONFIG

    cfg = Config(config_dict=copy.deepcopy(TINY_CONFIG))
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 2)
    svc = StreamingPredictor(
        model, variables["params"], reg, mean=[0.33] * 3, std=[0.18] * 3,
        image_size=S, max_batch=4, max_delay_ms=2.0, autoscale=False)
    try:
        svc.submit(np.zeros((S, S, 3), np.uint8), "T1_planes").result(
            timeout=120)
        assert svc.stats["by_size"] == {4: 1}
        assert svc.stats["pad_images"] == 3
    finally:
        svc.close()


def test_warmup_precompiles_chain(service):
    service.warmup(task_ids=["T1_planes"], sizes=[1, 2])
    # no exception and no queued work afterwards
    assert all(q.empty() for q in service._queues.values())


def test_mixed_flood_results_route_correctly(service):
    """Async dispatch (completion thread, max_inflight>1) must not scramble
    result->future routing across task types or within a batch."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (S, S, 3), dtype=np.uint8)
    futs = []
    for i in range(24):
        tid = ["T2A_organ_a", "T1_planes", "T4_box", "T5_points"][i % 4]
        futs.append((tid, service.submit(img, tid)))
    for tid, f in futs:
        r = f.result(timeout=240)
        if tid == "T2A_organ_a":
            assert r.shape == (S, S)
        elif tid == "T1_planes":
            assert r.shape == ()
        elif tid == "T4_box":
            assert r.shape == (4,)
        else:
            assert r.ndim == 1 and r.shape[0] >= 4
    # identical inputs -> identical outputs (catches wrong-slice bugs)
    f1 = service.submit(img, "T1_planes")
    f2 = service.submit(img, "T1_planes")
    assert int(f1.result(timeout=240)) == int(f2.result(timeout=240))
