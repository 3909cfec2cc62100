"""Golden-value regression tests (SURVEY.md §4): fixed seeds + fixed
synthetic data → training-step losses must reproduce stored values.
Guards the numerics of the whole objective stack across refactors.

Goldens were produced on CPU f32 (jax 0.9.0) by this same code — they guard
*refactors*, not correctness. Ground truth against the reference lives in
tests/test_reference_parity.py, which executes the reference's own
training_step/validation_step code on identical weights and inputs and
agrees with these objectives to rtol 5e-4; a transcription error in the
loss stack would fail there, not here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import flows, models
from links_tpu.config import LifterTrainConfig
from links_tpu.objectives import (
    LifterFrozen,
    left_right_loss,
    leg_torso_loss,
    occlusion_loss,
    pseudo_3d_from_lifters,
)
from links_tpu.objectives.flow_nll import full_flow_loss

HID = 64


def _poses(n=32):
    p = jax.random.normal(jax.random.PRNGKey(100), (n, 2, 17)) * 0.1
    return p.at[:, :, 0].set(0.0).reshape(n, 34)


def test_golden_full_flow_loss():
    flow = flows.init_flow(jax.random.PRNGKey(0), 34, hidden=HID)
    loss, aux = full_flow_loss(flow.params, flow.perm, _poses(),
                               jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux["dist_2d"]), 0.0849091, rtol=2e-3)
    np.testing.assert_allclose(float(aux["dist_2d_sample"]), 0.0975249, rtol=2e-3)


def test_golden_left_right_loss():
    keys = jax.random.split(jax.random.PRNGKey(2), 5)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(keys[0], 11),
        models.init_lifter(keys[1], 11),
    )
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34, hidden=HID),
        part_a=flows.init_flow(keys[3], 22, hidden=HID),
        part_b=flows.init_flow(keys[4], 22, hidden=HID),
    )
    _, aux = left_right_loss(stacked, frozen, _poses(), jax.random.PRNGKey(3),
                             LifterTrainConfig())
    golden = {
        "likeli": 0.2488410,
        "L3d": 5.2872038,
        "rep_rot": 1.5593992,
        "re_rot_3d": 8.3237991,
        "bl_prior": 13.6852093,
        "loss": 699.6796875,
    }
    for k, v in golden.items():
        np.testing.assert_allclose(float(aux[k]), v, rtol=2e-3, err_msg=k)


def test_golden_leg_torso_loss():
    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    leg = models.init_lifter(keys[0], 7)
    torso = models.init_lifter(keys[1], 10)
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34, hidden=HID),
        part_a=flows.init_flow(keys[3], 14, hidden=HID),
        part_b=flows.init_flow(keys[4], 20, hidden=HID),
    )
    _, aux = leg_torso_loss(leg, torso, frozen, _poses(), jax.random.PRNGKey(5),
                            LifterTrainConfig())
    golden = {
        # likeli re-pinned when the coupling clamp constant moved to
        # FrEIA's literal 0.636 (was 2/pi); the other terms are flow-free
        "likeli": 0.0183557,
        "L3d": 2.4151449,
        "rep_rot": 0.6505681,
        "re_rot_3d": 3.4912312,
        "bl_prior": 6.6194873,
        "loss": 337.5496521,
    }
    for k, v in golden.items():
        np.testing.assert_allclose(float(aux[k]), v, rtol=2e-3, err_msg=k)


def test_golden_occlusion_loss():
    completers = models.init_all_completers(jax.random.PRNGKey(6))
    leg = models.init_lifter(jax.random.PRNGKey(7), 7)
    torso = models.init_lifter(jax.random.PRNGKey(8), 10)
    pose3d = pseudo_3d_from_lifters(leg, torso, _poses())
    loss, _ = occlusion_loss(completers, pose3d, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(loss), 262.4854126, rtol=2e-3)
