"""Pure-function annealing schedules.

TPU-native counterpart of reference ``spair/modules.py:191-213``
(``exponential_decay``). The step is a traced scalar so schedule values flow
through jit without retracing; the staircase floor-div and the log-space
variant reproduce the reference exactly, including the ``+1e-6`` inside the
log.
"""

from __future__ import annotations

import jax.numpy as jnp

from spair_pytorch_tpu.config import Schedule


def exponential_decay(step, sched: Schedule):
    """value = (start - end) * rate**t + end, t = step/decay_step.

    With ``staircase`` the exponent is floored (so rate=0, staircase=True
    yields exactly 1.0 for step < decay_step because 0**0 == 1, and 0.0
    after — the reference training-wheel cliff, config.py:58-62).
    With ``log_space`` returns log(value + 1e-6) (reference modules.py:210-211).
    """
    step = jnp.asarray(step, jnp.float32)
    t = step // sched.decay_step if sched.staircase else step / sched.decay_step
    value = (sched.start - sched.end) * jnp.power(sched.decay_rate, t) + sched.end
    if sched.log_space:
        value = jnp.log(value + 1e-6)
    return value
