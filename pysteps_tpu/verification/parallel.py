"""
Mesh-distributed streaming verification accumulation.

The reference's streaming protocol (init/accum/merge/compute, e.g.
pysteps/verification/detcatscores.py:100-266, spatialscores.py:549-657,
probscores.py:77-134) merges associatively across cases — the distributed
reduction the design maps onto ``psum`` (SURVEY.md §2.16).  Here the case
axis is sharded over a mesh axis with ``shard_map``: every device
accumulates its local cases and one ``psum`` reduces the sufficient
statistics.  The returned state dicts are exactly the serial ones, so the
existing ``*_compute`` functions apply unchanged.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pysteps_tpu.verification import detcatscores, probscores, spatialscores


def _case_spec(mesh, axis_name):
    if mesh.shape[axis_name] < 1:
        raise ValueError(f"mesh has no axis {axis_name}")
    return P(axis_name)


def sharded_det_cat_accum(pred_cases, obs_cases, thr, mesh, axis_name="ens"):
    """Contingency-table accumulation over a case axis sharded on the mesh.

    pred_cases/obs_cases: (C, m, n) stacks with C divisible by the mesh
    axis size.  Returns the same state dict a serial
    ``det_cat_fct_accum``/``det_cat_fct_merge`` chain produces
    (reference: detcatscores.py:133-265).
    """
    spec = _case_spec(mesh, axis_name)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=P()
    )
    def run(pred, obs):
        valid = jnp.isfinite(pred) & jnp.isfinite(obs)
        predb = (pred > thr) & valid
        obsb = (obs > thr) & valid
        local = jnp.stack(
            [
                jnp.sum(predb & obsb),
                jnp.sum(predb & ~obsb & valid),
                jnp.sum(~predb & obsb & valid),
                jnp.sum(~predb & ~obsb & valid),
            ]
        )
        return jax.lax.psum(local, axis_name)

    h, f, m_, r = run(jnp.asarray(pred_cases), jnp.asarray(obs_cases))
    return {
        "hits": h, "false_alarms": f, "misses": m_, "correct_negatives": r,
        "thr": thr, "axis": None,
    }


def sharded_crps_accum(ens_cases, obs_cases, mesh, axis_name="ens"):
    """CRPS sufficient statistics over sharded cases.

    ens_cases: (C, n_members, m, n); obs_cases: (C, m, n).  Returns the
    serial CRPS state dict (reference: probscores.py:77-134).
    """
    spec = _case_spec(mesh, axis_name)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=P()
    )
    def run(ens, obs):
        c, n_members = ens.shape[0], ens.shape[1]
        flat_f = ens.reshape(c, n_members, -1)
        flat_o = obs.reshape(c, -1)
        valid = jnp.all(jnp.isfinite(flat_f), axis=1) & jnp.isfinite(flat_o)
        fsort = jnp.sort(flat_f, axis=1)
        term1 = jnp.mean(jnp.abs(flat_f - flat_o[:, None]), axis=1)
        idx = jnp.arange(n_members)
        pair = jnp.sum(
            (2 * idx + 1 - n_members)[None, :, None] * fsort, axis=1
        ) / (n_members * n_members)
        crps_pix = term1 - pair
        local = jnp.stack(
            [
                jnp.sum(jnp.where(valid, crps_pix, 0.0)),
                jnp.sum(valid).astype(jnp.float32),
            ]
        )
        return jax.lax.psum(local, axis_name)

    s, n = run(jnp.asarray(ens_cases, jnp.float32), jnp.asarray(obs_cases, jnp.float32))
    return {"CRPS_sum": float(s), "n": float(n)}


def sharded_fss_accum(pred_cases, obs_cases, thr, scale, mesh, axis_name="ens"):
    """FSS sufficient statistics over sharded cases.

    pred_cases/obs_cases: (C, m, n).  Returns the serial FSS state dict
    (reference: spatialscores.py:549-657)."""
    spec = _case_spec(mesh, axis_name)
    scale = int(scale)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=P()
    )
    def run(pred, obs):
        valid = jnp.isfinite(pred) & jnp.isfinite(obs)
        I_f = ((pred >= thr) & valid).astype(jnp.float32)
        I_o = ((obs >= thr) & valid).astype(jnp.float32)
        if scale > 1:
            S_f = jax.vmap(
                lambda x: spatialscores._uniform_filter(x, scale)
            )(I_f)
            S_o = jax.vmap(
                lambda x: spatialscores._uniform_filter(x, scale)
            )(I_o)
        else:
            S_f, S_o = I_f, I_o
        local = jnp.stack(
            [
                jnp.sum(S_o**2),
                jnp.sum(S_f * S_o),
                jnp.sum(S_f**2),
            ]
        )
        return jax.lax.psum(local, axis_name)

    so, fo, sf = run(jnp.asarray(pred_cases), jnp.asarray(obs_cases))
    return {
        "thr": thr, "scale": scale, "sum_obs_sq": float(so),
        "sum_fct_obs": float(fo), "sum_fct_sq": float(sf),
    }


def distributed_verify(score, mesh, axis_name="ens", **kwargs):
    """Convenience dispatcher: name -> (sharded_accum, compute) pair.

    ``sharded_accum(*cases)`` returns the serial state; the matching
    ``compute`` is the unchanged serial one."""
    table = {
        "det_cat": (
            lambda p, o: sharded_det_cat_accum(
                p, o, kwargs["thr"], mesh, axis_name
            ),
            detcatscores.det_cat_fct_compute,
        ),
        "CRPS": (
            lambda e, o: sharded_crps_accum(e, o, mesh, axis_name),
            probscores.CRPS_compute,
        ),
        "FSS": (
            lambda p, o: sharded_fss_accum(
                p, o, kwargs["thr"], kwargs["scale"], mesh, axis_name
            ),
            spatialscores.fss_compute,
        ),
    }
    if score not in table:
        raise ValueError(
            f"unknown distributed score {score}; available: {list(table)}"
        )
    return table[score]
