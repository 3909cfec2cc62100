import jax
import jax.numpy as jnp
import numpy as np

from links_tpu import flows, models, train
from links_tpu.config import (
    FlowTrainConfig,
    LifterTrainConfig,
    OcclusionTrainConfig,
    OptimConfig,
    PartFlowTrainConfig,
)
from links_tpu.objectives import LifterFrozen

HID = 32


def _poses(rng, n=64):
    p = rng.normal(size=(n, 2, 17)).astype(np.float32) * 0.1
    p[:, :, 0] = 0.0
    return jnp.asarray(p.reshape(n, 34))


def test_optimizer_matches_torch_adam_l2():
    """One optax step == torch Adam(weight_decay) on a quadratic."""
    torch = __import__("torch")
    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    g = np.array([0.1, 0.2, -0.3], dtype=np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([tw], lr=2e-4, weight_decay=1e-5)
    tw.grad = torch.tensor(g)
    opt.step()

    optimizer = train.make_optimizer(OptimConfig(), steps_per_epoch=100)
    state = optimizer.init(jnp.asarray(w0))
    updates, _ = optimizer.update(jnp.asarray(g), state, jnp.asarray(w0))
    w1 = np.asarray(jnp.asarray(w0) + updates)
    np.testing.assert_allclose(w1, tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_lr_schedule_staircase():
    import optax

    optimizer = train.make_optimizer(OptimConfig(), steps_per_epoch=10)
    params = jnp.zeros((3,))
    state = optimizer.init(params)
    g = jnp.ones((3,))
    lrs = []
    for i in range(25):
        updates, state = optimizer.update(g, state, params)
        lrs.append(float(jnp.abs(updates).mean()))
    # epochs 0,1,2 -> ratio ~0.95 between them (adam scale steady on const grad)
    assert abs(lrs[15] / lrs[5] - 0.95) < 0.01
    assert abs(lrs[22] / lrs[12] - 0.95) < 0.01


def test_full_flow_training_reduces_nll(rng):
    cfg = FlowTrainConfig(bf16=False)
    flow = flows.init_flow(jax.random.PRNGKey(0), 34, hidden=HID)
    optimizer = train.make_optimizer(cfg.optim, steps_per_epoch=4)
    step = train.build_full_flow_step(flow.perm, optimizer, cfg)
    state = train.init_state(flow.params, optimizer)
    data = _poses(rng, 256)
    key = jax.random.PRNGKey(1)
    first = None
    jstep = jax.jit(step)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, aux = jstep(state, data, sub)
        if first is None:
            first = float(aux["dist_2d"])
    assert float(aux["dist_2d"]) < first


def test_epoch_scan_matches_stepwise(rng):
    """make_epoch_fn(scan) == manual python loop over the same batches."""
    cfg = FlowTrainConfig(bf16=False)
    flow = flows.init_flow(jax.random.PRNGKey(0), 34, hidden=HID)
    optimizer = train.make_optimizer(cfg.optim, steps_per_epoch=4)
    step = train.build_full_flow_step(flow.perm, optimizer, cfg)
    state = train.init_state(flow.params, optimizer)
    data = _poses(rng, 64)
    epoch_fn = train.make_epoch_fn(step, batch_size=16)
    key = jax.random.PRNGKey(5)

    # replicate on host first (epoch_fn donates its state argument)
    n = 64
    k_perm, k_steps = jax.random.split(key)
    idx = jax.random.permutation(k_perm, n)
    batches = data[idx].reshape(4, 16, 34)
    step_keys = jax.random.split(k_steps, 4)
    st = state
    for i in range(4):
        st, aux = step(st, batches[i], step_keys[i])

    out_state, losses = epoch_fn(state, data, key)
    np.testing.assert_allclose(
        np.asarray(out_state.params["global_offset"]),
        np.asarray(st.params["global_offset"]),
        rtol=1e-5, atol=1e-6,
    )
    assert int(out_state.step) == 4


def test_part_flows_step_runs(rng):
    cfg = PartFlowTrainConfig(bf16=False)
    full = flows.init_flow(jax.random.PRNGKey(0), 34, hidden=HID)
    parts = {
        "left": flows.init_flow(jax.random.PRNGKey(1), 22, hidden=HID),
        "right": flows.init_flow(jax.random.PRNGKey(2), 22, hidden=HID),
        "legs": flows.init_flow(jax.random.PRNGKey(3), 14, hidden=HID),
        "torso": flows.init_flow(jax.random.PRNGKey(4), 20, hidden=HID),
    }
    params = {k: v.params for k, v in parts.items()}
    perms = {k: v.perm for k, v in parts.items()}
    optimizer = train.make_optimizer(cfg.optim, 4)
    step = jax.jit(train.build_part_flows_step(perms, full, optimizer, cfg))
    state = train.init_state(params, optimizer)
    state, aux = step(state, _poses(rng, 32), jax.random.PRNGKey(9))
    for k in ("dist_2d_left", "dist_2d_torso_sample", "loss"):
        assert np.isfinite(float(aux[k])), k


def test_left_right_step_trains(rng):
    cfg = LifterTrainConfig(bf16=False)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(keys[0], 11, hidden=HID),
        models.init_lifter(keys[1], 11, hidden=HID),
    )
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34, hidden=HID),
        part_a=flows.init_flow(keys[3], 22, hidden=HID),
        part_b=flows.init_flow(keys[4], 22, hidden=HID),
    )
    optimizer = train.make_optimizer(cfg.optim, 2)
    step = jax.jit(train.build_left_right_step(frozen, optimizer, cfg))
    state = train.init_state(stacked, optimizer)
    data = _poses(rng, 32)
    key = jax.random.PRNGKey(1)
    l0 = None
    for i in range(8):
        key, sub = jax.random.split(key)
        state, aux = step(state, data, sub)
        if l0 is None:
            l0 = float(aux["loss"])
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["loss"]) < l0  # strong unsupervised signal at init
    assert int(state.step) == 8


def test_occlusion_step_trains(rng):
    cfg = OcclusionTrainConfig(bf16=False)
    completers = models.init_all_completers(jax.random.PRNGKey(0), hidden=HID)
    leg = models.init_lifter(jax.random.PRNGKey(1), 7, hidden=HID)
    torso = models.init_lifter(jax.random.PRNGKey(2), 10, hidden=HID)
    optimizer = train.make_optimizer(cfg.optim, 2)
    step = jax.jit(train.build_occlusion_step(leg, torso, optimizer, cfg))
    state = train.init_state(completers, optimizer)
    data = _poses(rng, 32)
    key = jax.random.PRNGKey(3)
    l0 = None
    for i in range(6):
        key, sub = jax.random.split(key)
        state, aux = step(state, data, sub)
        if l0 is None:
            l0 = float(aux["loss"])
    assert float(aux["loss"]) < l0


def test_clip_grad_norm_bounds_update():
    """OptimConfig.clip_grad_norm caps the pre-Adam gradient at the given
    global norm; with it off (the reference default) the raw gradient
    passes through. Robustness guard for the flow stages' self-sample NLL
    explosions (see OptimConfig docstring)."""
    import dataclasses

    import jax.numpy as jnp
    import optax

    from links_tpu.config import OptimConfig

    params = {"w": jnp.ones((4,))}
    huge = {"w": jnp.full((4,), 1e8)}

    def first_moment(opt):
        state = opt.init(params)
        _, state = opt.update(huge, state, params)
        # scale_by_adam is the second element of the chain when clipping is
        # off, third when on; find it by attribute
        for s in jax.tree.leaves(state, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(s, "mu"):
                return float(jnp.abs(s.mu["w"]).max())
        raise AssertionError("no adam state found")

    clipped = train.make_optimizer(
        dataclasses.replace(OptimConfig(), clip_grad_norm=1.0), 1)
    unclipped = train.make_optimizer(OptimConfig(), 1)
    # clipped: global norm 1.0 -> per-coord 0.5; adam mu = (1-b1)*g
    assert first_moment(clipped) < 0.1
    assert first_moment(unclipped) > 1e6


def test_bf16_moments_storage_and_trajectory():
    """bf16_moments stores mu/nu in bfloat16 at rest while keeping the
    update trajectory close to f32 Adam (the opt-in HBM-traffic knob,
    train/optim.py)."""
    import dataclasses

    import jax.numpy as jnp
    import optax

    from links_tpu.config import OptimConfig

    params = {"w": jnp.linspace(-1, 1, 64)}
    opt16 = train.make_optimizer(
        dataclasses.replace(OptimConfig(), bf16_moments=True), 4)
    opt32 = train.make_optimizer(OptimConfig(), 4)

    def moments_dtype(state):
        for s in jax.tree.leaves(state, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(s, "mu"):
                return s.mu["w"].dtype
        raise AssertionError("no adam state")

    s16, s32 = opt16.init(params), opt32.init(params)
    assert moments_dtype(s16) == jnp.bfloat16
    assert moments_dtype(s32) == jnp.float32

    p16 = p32 = params
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, k = jax.random.split(key)
        g16 = {"w": jax.random.normal(k, (64,)) * 0.1 + p16["w"] * 0.01}
        g32 = {"w": g16["w"]}
        u16, s16 = opt16.update(g16, s16, p16)
        u32, s32 = opt32.update(g32, s32, p32)
        p16 = optax.apply_updates(p16, u16)
        p32 = optax.apply_updates(p32, u32)
        assert moments_dtype(s16) == jnp.bfloat16
    drift = float(jnp.abs(p16["w"] - p32["w"]).max())
    moved = float(jnp.abs(p32["w"] - params["w"]).max())
    assert moved > 1e-4  # the test actually optimized something
    assert drift < 0.05 * moved, (drift, moved)
