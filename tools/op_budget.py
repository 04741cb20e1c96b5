"""Op-budget probe: how many vector ops is one bitplane env-step?

Lowers the exact scan-body computation of the throughput engine (xorshift
action draw + bit-packed step + episode-stat accumulators, level tables as
constants) and histograms its elementwise ops — the concrete basis for the
"~N VPU-op-equivalents per env-step" figures in docs/PERFORMANCE.md §3.

Counts are taken from the UNOPTIMIZED StableHLO (backend-independent upper
bound; XLA's simplifier folds some of it, e.g. select(p, x, x) → x), so
read them as "ops written", not "ops executed".

Run:  python tools/op_budget.py
"""

import collections
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from griduniverse_tpu import make_semantics
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.ops.bitplane import (
    pack_level,
    reset_bits,
    step_bits,
    xorshift_init,
    xorshift_next,
)

ELEMENTWISE = {
    "add", "subtract", "multiply", "divide", "remainder", "and", "or",
    "xor", "not", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "select", "compare", "convert", "maximum",
    "minimum", "negate", "clamp",
}


def main():
    sem = make_semantics()
    bl = jax.tree.map(lambda x: jnp.asarray(x), pack_level(walls_and_goal_16x16()))
    batch = 65_536
    state = reset_bits(bl, batch)
    rs = xorshift_init(jnp.uint32(1), (batch,))
    zf = jnp.zeros((batch,), jnp.float32)
    zi = jnp.zeros((batch,), jnp.int32)

    def body(state, rs, run_ret, n_eps, ret_sum, len_sum):
        rs, bits = xorshift_next(rs)
        actions = ((bits >> 9) % jnp.uint32(4)).astype(jnp.int32)
        ep_len = state.t + 1
        state, (obs, reward, done) = step_bits(sem, bl, state, actions, True, 512)
        run_ret = run_ret + reward
        n_eps = n_eps + done
        ret_sum = ret_sum + jnp.where(done, run_ret, 0.0)
        len_sum = len_sum + jnp.where(done, ep_len, 0)
        run_ret = jnp.where(done, 0.0, run_ret)
        return state, rs, run_ret, n_eps, ret_sum, len_sum

    hlo = jax.jit(body).lower(state, rs, zf, zi, zf, zi).as_text()
    hist = collections.Counter()
    for m in re.finditer(r"stablehlo\.(\w+)", hlo):
        hist[m.group(1)] += 1

    ew = {k: v for k, v in hist.items() if k in ELEMENTWISE}
    total = sum(ew.values())
    print(f"{'op':>24}  count")
    for k, v in sorted(ew.items(), key=lambda kv: -kv[1]):
        print(f"{k:>24}  {v}")
    print(f"{'TOTAL elementwise':>24}  {total}")
    other = {k: v for k, v in hist.items() if k not in ELEMENTWISE
             and k not in ("constant", "return", "func")}
    print(f"\nnon-elementwise: {dict(sorted(other.items(), key=lambda kv: -kv[1]))}")


if __name__ == "__main__":
    main()
