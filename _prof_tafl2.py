import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env

env = get_env("hnefatafl")
B = 512
states = jax.vmap(lambda _: env.init())(jnp.arange(B))
acts = jnp.argmax(jax.vmap(env.valid_moves)(states).astype(jnp.float32), -1).astype(jnp.int32)

def bench(label, fn):
    @jax.jit
    def run(states):
        def body(c, i):
            out = fn(c, i)
            return c, out
        _, o = jax.lax.scan(body, states, jnp.arange(50))
        return jax.tree_util.tree_map(lambda x: x.sum() if hasattr(x, 'sum') else x, o)
    jax.block_until_ready(run(states))
    t0 = time.time()
    jax.block_until_ready(run(states))
    print(f"{label}: {(time.time()-t0)/50*1e3:.3f} ms/call")

# iteration-dependent action to defeat caching/LICM
def vary(i):
    return (acts + i) % env.ACTION_SIZE

bench("step",       lambda st, i: jax.vmap(env.step)(st, acts * 0 + jnp.where(jax.vmap(env.valid_moves)(st)[jnp.arange(B), (acts+i)%env.ACTION_SIZE], (acts+i)%env.ACTION_SIZE, acts)).board.astype(jnp.int32).sum())
bench("valid_moves", lambda st, i: jax.vmap(env.valid_moves)(st).sum() + i)
bench("win_state",  lambda st, i: jax.vmap(env.win_state)(st).sum() + i)
bench("observation", lambda st, i: jax.vmap(env.observation)(st).sum() + i)
