"""Coach — the training orchestrator.

TPU-native counterpart of the reference Coach (reference:
alphazero/Coach.py:153-591). The iteration structure, gating rules, history
window, warmup policy, resume semantics and metric tags are kept 1:1; the
runtime changes completely: self-play is a jitted on-device program advanced
in chunks (no worker processes, queues or shared tensors), training consumes
host-side sample files through a simple shuffled iterator, and model gating is
a pytree swap between two resident parameter sets.
"""

from __future__ import annotations

import threading
import time
from enum import Enum
from glob import glob
import os

import jax

import numpy as np

from alphazero_general_tpu.models.wrapper import NNetWrapper
from alphazero_general_tpu.selfplay.arena import (
    ArenaConfig,
    make_arena_fn,
    raw_mcts_apply,
    winrates,
)
from alphazero_general_tpu.selfplay.replay import (
    ReplayStore,
    batch_iterator,
    game_stats_arrays,
    history_window,
)
from alphazero_general_tpu.selfplay.selfplay import (
    SelfPlayConfig,
    init_selfplay,
    make_move_fns,
)
from alphazero_general_tpu.utils.config import Args
from alphazero_general_tpu.utils.metrics import make_writer
from alphazero_general_tpu.utils.misc import get_iter_file


def _copy_to_host_async(tree) -> None:
    """Start device→host copies early so record transfers overlap compute
    (device_get at stack time then finds the bytes already on host)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.copy_to_host_async()
        except (AttributeError, RuntimeError):
            return


class TrainState(Enum):
    """Status surface polled by UIs (reference: Coach.py:129-139)."""

    STANDBY = 0
    INIT = 1
    INIT_AGENTS = 2
    SELF_PLAY = 3
    SAVE_SAMPLES = 4
    PROCESS_RESULTS = 5
    KILL_AGENTS = 6
    TRAIN = 7
    COMPARE_BASELINE = 8
    COMPARE_PAST = 9


class Coach:
    def __init__(self, env, nnet: NNetWrapper, args: Args):
        self.state = TrainState.INIT
        self.env = env
        self.args = args
        self.args._num_players = env.NUM_PLAYERS + int(env.HAS_DRAW)
        self.train_net = nnet
        self.self_play_net = NNetWrapper(env, args)

        # Device mesh over the game/batch axis (args.mesh_batch_axis, -1 =
        # all devices). This is the production multi-chip path — the TPU
        # replacement for the reference's per-CPU-core actor fan-out + single
        # GPU learner (Coach.py:290-361): self-play carries, train batches and
        # arena games shard over it; parameters replicate.
        from alphazero_general_tpu.parallel.mesh import make_mesh, usable_devices

        n_dev = usable_devices(
            int(args.get("mesh_batch_axis", -1)),
            int(args.process_batch_size),
            int(args.train_batch_size),
            int(args.arenaCompare),
            int(args.arenaCompareBaseline),
        )
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        if self.mesh is not None:
            print(f"[mesh] data-parallel over {n_dev} devices")
            self.train_net.attach_mesh(self.mesh)
            self.self_play_net.attach_mesh(self.mesh)

        self.ckpt_folder = os.path.join(args.checkpoint, args.run_name)
        os.makedirs(self.ckpt_folder, exist_ok=True)

        # Resume discovery (Coach.py:165-181).
        train_iter = args.startIter
        if args.load_model:
            networks = sorted(glob(os.path.join(self.ckpt_folder, "*.ckpt")))
            self.args.startIter = len(networks)
            if self.args.startIter == 0:
                self._save_model(self.train_net, 0)
                self.args.startIter = 1
            train_iter = self.args.startIter - 1
            self._load_model(self.train_net, train_iter)

        if args.selfPlayModelIter == 0:
            self.self_play_iter = 0
        else:
            self.self_play_iter = args.selfPlayModelIter or \
                self._load_run_state().get("self_play_iter", train_iter)
            self.self_play_iter = min(self.self_play_iter, train_iter)
        if args.model_gating:
            self._load_model(self.self_play_net, self.self_play_iter)

        self.gating_counter = 0
        self.warmup = False
        self.model_iter = self.args.startIter
        self.loss_pi = 0.0
        self.loss_v = 0.0
        self.sample_time = 0.0
        self.games_played_iter = 0
        self.stop_train = threading.Event()
        self.pause_train = threading.Event()
        self.train_net.stop_train = self.stop_train
        self.train_net.pause_train = self.pause_train

        self.store = ReplayStore(args.data, args.run_name)
        # args.log_dir: metrics destination (default "runs"). Strength runs
        # point this at a durable results/ dir so curves survive the host
        # (two round-3 runs died with their metrics in gitignored runs/).
        self.writer = make_writer(
            str(args.get("log_dir", "runs")), args.run_name)
        from alphazero_general_tpu.utils.trace import PhaseTracer

        self.tracer = PhaseTracer(
            self.writer, str(args.get("profile_dir", "") or ""))
        self._np_rng = np.random.default_rng(int(args.get("seed", 0)))
        self._rng = jax.random.PRNGKey(int(args.get("seed", 0)) + 1)

        # Jitted programs, built lazily (first call compiles).
        self._chunk_fns = {}
        self._quant_ok = None  # tri-state: unknown / usable / unsupported
        self._arena_fn = None
        self._baseline_fn = None
        self._dev_window = None  # device-resident replay ring (train())

    # ------------------------------------------------------------- utilities
    def _save_model(self, net: NNetWrapper, iteration: int) -> None:
        # Params are identical on every host (global-batch grad psum);
        # process 0 writes, others wait at the barrier before loading.
        if jax.process_index() == 0:
            net.save_checkpoint(self.ckpt_folder, get_iter_file(iteration))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_saved")

    def _load_model(self, net: NNetWrapper, iteration: int) -> None:
        net.load_checkpoint(self.ckpt_folder, get_iter_file(iteration))

    def _run_state_path(self) -> str:
        return os.path.join(self.ckpt_folder, "run_state.json")

    def _load_run_state(self) -> dict:
        """Gating/run state persisted across restarts — the reference only
        persists selfPlayModelIter through its GUI (main.py:383-387); here
        headless resume keeps the gated model too."""
        import json

        try:
            with open(self._run_state_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _save_run_state(self) -> None:
        import json

        if jax.process_index() != 0:
            return

        with open(self._run_state_path(), "w") as f:
            json.dump({
                "self_play_iter": self.self_play_iter,
                "model_iter": self.model_iter,
                "gating_counter": self.gating_counter,
            }, f)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _apply_fn(self):
        model = self.train_net.model

        def apply(variables, obs):
            return model.apply(variables, obs, train=False)

        return apply

    def _quant_calib_obs(self, iteration: int, max_obs: int = 8192):
        """Calibration observations for int8 re-quantization: a subsample of
        the most recent iteration's replay samples (guided self-play
        positions — the distribution inference actually sees). Returns None
        when no replay exists yet (cold start → random playouts)."""
        for it in range(iteration - 1, 0, -1):
            data = self.store.load(it)
            if data is not None and len(data[0]):
                obs = data[0]
                if len(obs) > max_obs:
                    idx = self._np_rng.choice(len(obs), max_obs, replace=False)
                    obs = obs[idx]
                return jax.numpy.asarray(obs, jax.numpy.float32)
        return None

    def _move_fns(self, quant: bool = False):
        """Separately-jitted fast/full/warmup move runners (host-side
        fast-sim choice — far cheaper to compile than traced two-branch
        search conds). ``quant=True`` binds the int8 apply fn
        (models/quant.py) — callers then pass quantized parameters."""
        key = "fns_quant" if quant else "fns"
        if not self._chunk_fns:
            self._chunk_fns = {
                "cfg": SelfPlayConfig.from_args(
                    self.args, self.env.NUM_PLAYERS, self.env.HAS_DRAW
                ),
            }
        if key not in self._chunk_fns:
            if quant:
                from alphazero_general_tpu.models.quant import quant_apply

                apply_fn = quant_apply
            else:
                apply_fn = self._apply_fn()
            self._chunk_fns[key] = make_move_fns(
                self.env, self._chunk_fns["cfg"], apply_fn, mesh=self.mesh)
        return self._chunk_fns["cfg"], self._chunk_fns[key]

    # ------------------------------------------------------------ main loop
    def learn(self) -> None:
        """Iteration loop (Coach.py:225-288)."""
        while self.model_iter <= self.args.numIters:
            print(f"------ITER {self.model_iter}------")
            skip = (
                self.args.skipSelfPlayIters
                and self.model_iter <= self.args.skipSelfPlayIters
            ) or (
                self.args.train_on_past_data
                and self.model_iter == self.args.startIter
            )
            if not skip:
                if self.model_iter <= self.args.numWarmupIters:
                    print("Warmup: random policy and value")
                    self.warmup = True
                elif self.self_play_iter == 0:
                    self.warmup = True
                else:
                    self.warmup = False
                with self.tracer.phase("self_play", self.model_iter):
                    self.generate_self_play_data(self.model_iter)
                if self.stop_train.is_set():
                    break

            with self.tracer.phase("train", self.model_iter):
                self.train(self.model_iter)
            if self.stop_train.is_set():
                break

            if self.args.compareWithBaseline and \
                    int(self.args.arenaCompareBaseline) > 0 and \
                    (self.model_iter - 1) % self.args.baselineCompareFreq == 0:
                with self.tracer.phase("arena_baseline", self.model_iter):
                    self.compare_to_baseline(self.model_iter)
                if self.stop_train.is_set():
                    break

            if self.args.compareWithPast and \
                    int(self.args.arenaCompare) > 0 and \
                    (self.model_iter - 1) % self.args.pastCompareFreq == 0:
                with self.tracer.phase("arena_past", self.model_iter):
                    self.compare_to_past(self.model_iter)
                if self.stop_train.is_set():
                    break

            self.writer.add_scalar(
                "win_rate/self_play_model", self.self_play_iter, self.model_iter
            )
            self.model_iter += 1
            self._save_run_state()
        self.state = TrainState.STANDBY

    # ------------------------------------------------------------- self-play
    def generate_self_play_data(self, iteration: int) -> None:
        """Run jitted self-play chunks until gamesPerIteration games finish
        (replaces Coach.py:290-435: agents + inference server + sample drain).
        """
        self.state = TrainState.SELF_PLAY
        batch = int(self.args.process_batch_size)
        target = int(self.args.gamesPerIteration)

        # Self-play uses the gated model (Coach.py:337-338).
        net = self.self_play_net if self.args.model_gating else self.train_net
        quant = (bool(self.args.get("quant_selfplay", False))
                 and not self.warmup and self._quant_ok is not False)
        if quant:
            try:
                # Re-quantize each iteration: weights/scales track training.
                # Calibrate on the previous iteration's replay observations
                # (the actual guided-play distribution — random playouts are
                # only the cold-start fallback inside quantized_inference).
                variables, _ = net.quantized_inference(
                    calib_obs=self._quant_calib_obs(iteration),
                    rng=self._next_rng())
                self._quant_ok = True
            except ValueError:
                quant = False
                self._quant_ok = False  # architecture has no quantized path
        if not quant:
            variables = net.state.variables
        cfg, fns = self._move_fns(quant=quant)

        # process_batch_size is the GLOBAL game batch; each host materializes
        # only its own slice (multi-host per-host feed, parallel/mesh.py).
        local_batch = batch
        if self.mesh is not None:
            local_batch = batch // jax.process_count()
        carry = init_selfplay(self.env, local_batch, cfg.start_temp, cfg=cfg)
        if self.mesh is not None:
            from alphazero_general_tpu.parallel.mesh import (
                replicate_tree, shard_selfplay_carry,
            )

            variables = replicate_tree(variables, self.mesh)
            carry = shard_selfplay_carry(carry, self.mesh)
        # Pipelined move loop: never block on the newest step — read the
        # completed-game counter PIPE moves behind the dispatch frontier so
        # the device (and the tunnel's ~20 ms dispatch latency) stays busy;
        # record payloads stream back via async host copies. Meta fields
        # (win/done/player/action) are kept for every round; obs/π only for
        # non-fast rounds (finalize discards fast samples anyway).
        from collections import deque

        from alphazero_general_tpu.parallel.mesh import local_rows
        from alphazero_general_tpu.selfplay.replay import StreamingFinalizer
        from alphazero_general_tpu.utils.misc import Bar

        PIPE = 8
        stats_win = []   # host [B, V] per round (small — stats + finalize)
        stats_done = []  # host [B] per round
        symmetric = bool(self.args.symmetricSamples) and \
            self.env.NUM_SYMMETRIES > 1
        writer = self.store.writer(
            iteration, self.env.OBS_SHAPE, self.env.ACTION_SIZE,
            int(self.args._num_players), raw=symmetric)
        # Symmetry expansion is deferred to training time (raw files +
        # load_window(symmetric_env=...)): expanding inline multiplied the
        # collection loop's host compression/IO by NUM_SYMMETRIES.
        fin = StreamingFinalizer(
            self.env, symmetric, writer.append, expand_at_collect=False)
        raw = deque()  # device-side rounds awaiting host materialization
        pending = deque()
        start = time.time()
        games_done = 0
        moves = 0

        A = self.env.ACTION_SIZE

        def _drain_round():
            """Materialize the oldest round on host (its async copy has had
            PIPE dispatches of head start) and feed the streaming finalize —
            host memory stays O(flush window + open games), VERDICT r2 #4.
            local_rows keeps only this host's shard of the global batch
            (per-host data feed, parallel/mesh.py)."""
            w, d, f, o, p, pidx = raw.popleft()
            w = local_rows(w).astype(np.float32)
            d = local_rows(d)
            stats_win.append(w)
            stats_done.append(d)
            if p is not None and pidx is not None:
                # Sparse top-k π record (MoveRecord.pi_idx) — densify on
                # host; k = sims+1 makes this exact, not approximate.
                vals = local_rows(p)
                idx = local_rows(pidx)
                dense = np.zeros((vals.shape[0], A), np.float16)
                np.put_along_axis(dense, idx.astype(np.int64), vals, axis=1)
                p = dense
            elif p is not None:
                p = local_rows(p)
            fin.add_round(
                w, d, f,
                obs=None if o is None else local_rows(o), pi=p)

        bar = Bar(f"Self-play iter {iteration}", max=target)
        while games_done < target and not self.stop_train.is_set():
            while self.pause_train.is_set():
                time.sleep(0.1)
            if self.warmup:
                kind = "warmup"
            else:
                # Batch-global fast/full draw (SelfPlayAgent.pyx:84-86).
                kind = "fast" if (
                    self._np_rng.random() < cfg.prob_fast
                ) else "full"
            carry, rec = fns[kind](variables, carry, self._next_rng())
            moves += 1
            m = (rec.win_state, rec.done, kind == "fast", rec.obs, rec.pi,
                 rec.pi_idx)
            _copy_to_host_async((rec.win_state, rec.done, rec.obs, rec.pi,
                                 rec.pi_idx))
            raw.append(m)
            pending.append(carry.games_played)
            # Drain PIPE moves behind the dispatch frontier so the device
            # (and the tunnel's ~20 ms dispatch latency) stays busy.
            while len(pending) > PIPE:
                games_done = int(pending.popleft())
                self.games_played_iter = games_done
                _drain_round()
                bar.suffix = f"moves {moves}"
                bar.goto(min(games_done, target))
            if moves % 64 == 0:
                # Collection-loop health line (non-TTY logs show no Bar):
                # round rate + host RSS + finalizer carry size — the
                # attribution data for any future stall/OOM (an iteration-3
                # OOM at 130 GB RSS was only diagnosable post-mortem).
                with open("/proc/self/statm") as f_:
                    rss_mb = int(f_.read().split()[1]) * 4096 // 2**20
                open_rows = sum(len(b[0]) for b in fin._open)
                la = jax.live_arrays()
                extra = ""
                if bool(self.args.get("collectDebug", False)):
                    # Full-heap scan — hundreds of ms with a multi-GB window
                    # resident, so opt-in only (args.collectDebug).
                    import gc

                    np_mb = sum(
                        o.nbytes for o in gc.get_objects()
                        if isinstance(o, np.ndarray)) // 2**20
                    try:
                        jits = {k: f._cache_size()
                                for k, f in fns.items()}
                    except Exception:
                        jits = {}
                    extra = f" np_mb={np_mb} jit_cache={jits}"
                print(f"[collect] moves={moves} games={games_done} "
                      f"rss_mb={rss_mb} open_blocks={len(fin._open)} "
                      f"open_rows={open_rows} jax_arrays={len(la)} "
                      f"jax_mb={sum(int(x.size) * x.dtype.itemsize for x in la) // 2**20}"
                      f"{extra} "
                      f"elapsed={time.time() - start:.0f}s", flush=True)
        games_done = int(carry.games_played)
        self.games_played_iter = games_done
        bar.goto(min(games_done, target))
        bar.finish()

        elapsed = time.time() - start
        self.sample_time = elapsed / max(games_done, 1)

        self.state = TrainState.SAVE_SAMPLES
        while raw:
            _drain_round()
        fin.finish()
        n_samples = writer.close()
        print(f"Saving {n_samples} samples ({games_done} games, "
              f"{elapsed:.1f}s, {self.sample_time * 1000:.1f} ms/game)")

        self.state = TrainState.PROCESS_RESULTS
        win = np.stack(stats_win, axis=0)   # [K, B, V]
        done = np.stack(stats_done, axis=0)  # [K, B]
        wins, draws, avg_len = game_stats_arrays(win, done)
        total = max(int(wins.sum()) + draws, 1)
        for i, w in enumerate(wins):
            credit = 0.5 * draws if self.args.use_draws_for_winrate else 0.0
            self.writer.add_scalar(
                f"win_rate/player{i}", (w + credit) / total, iteration
            )
        self.writer.add_scalar("win_rate/draws", draws / total, iteration)
        self.writer.add_scalar("win_rate/avg_game_length", avg_len, iteration)
        self.writer.add_scalar("loss/sample_time", self.sample_time, iteration)
        self.state = TrainState.STANDBY

    # -------------------------------------------------------------- training
    def train(self, iteration: int) -> None:
        """Train over the growing history window (Coach.py:437-525)."""
        self.state = TrainState.TRAIN
        if self.args.train_on_past_data and iteration == self.args.startIter:
            self._train_on_past_data(iteration)
            self.state = TrainState.STANDBY
            return
        window = history_window(
            iteration,
            int(self.args.minTrainHistoryWindow),
            int(self.args.maxTrainHistoryWindow),
            int(self.args.trainHistoryIncrementIters),
        )
        first = max(1, iteration - window)
        # maxWindowSamples (default 4M): uniform window subsample cap — the
        # reference loads its whole window into RAM too (Coach.py:466-469),
        # but long-game symmetric envs here emit ~3M samples/iteration and
        # an uncapped multi-iteration window is a host OOM (see
        # ReplayStore.load_window).
        sym_env = (self.env if bool(self.args.symmetricSamples)
                   and self.env.NUM_SYMMETRIES > 1 else None)
        # Device symmetries (default on): keep the window RAW and let each
        # jitted train step apply one random symmetry per drawn sample on
        # device — S times less host RAM/feed bandwidth than materializing
        # the expanded dataset the way the reference does (Coach.py:375-381).
        device_sym = sym_env is not None and bool(
            self.args.get("deviceSymmetries", True))
        # Device-resident window (VERDICT r4 item 1): iterations upload to an
        # HBM ring ONCE; the jitted step gathers minibatch rows on device and
        # the host ships only index vectors. Single-process/unmeshed only —
        # with a mesh the batch feed shards per host (per-host files), so the
        # host feed stays; requires raw rows when symmetric (device_sym).
        use_window = (
            bool(self.args.get("deviceWindow", True))
            and self.mesh is None and jax.process_count() == 1
            and (sym_env is None or device_sym)
        )
        data = None
        if use_window:
            if self._dev_window is None:
                from alphazero_general_tpu.selfplay.device_window import (
                    DeviceWindow,
                )

                n_sym_f = sym_env.NUM_SYMMETRIES if device_sym else 1
                rows = int(self.args.get("deviceWindowRows", 0)) or max(
                    int(self.args.get("maxWindowSamples", 4_000_000))
                    // n_sym_f, 65536)
                self._dev_window = DeviceWindow(
                    self.env.OBS_SHAPE, self.env.ACTION_SIZE,
                    int(self.args._num_players), rows)
                print(f"[device-window] ring {self._dev_window.rows} rows, "
                      f"{self._dev_window.nbytes / 2**20:.0f} MB HBM")
            self._dev_window.sync(self.store, first, iteration)
            phys = self._dev_window.indices_for(first, iteration)
            if not len(phys):
                print("Warning: no training data found; skipping train step")
                self.state = TrainState.STANDBY
                return
        else:
            data = self.store.load_window(
                first, iteration,
                max_samples=int(self.args.get("maxWindowSamples", 4_000_000)),
                rng=self._np_rng, symmetric_env=sym_env,
                expand=not device_sym)
            if data is None:
                print("Warning: no training data found; skipping train step")
                self.state = TrainState.STANDBY
                return
        self.train_net.set_device_symmetries(sym_env if device_sym else None)
        self.train_net.set_device_window(use_window)

        batch_size = int(self.args.train_batch_size)
        # Sample counts in training units (raw files scale by the symmetry
        # group) from file metadata — no full loads. Also feeds the
        # window/epoch accounting scalars below.
        counts = [
            m[0] for i in range(first, iteration + 1)
            if (m := self.store.sample_meta(i, sym_env)) is not None
        ]
        window_units = int(sum(counts))
        if self.args.autoTrainSteps:
            if self.args.averageTrainSteps:
                latest = int(np.mean(counts)) if counts else 0
            else:
                meta = self.store.sample_meta(iteration, sym_env)
                latest = meta[0] if meta else 0
            train_steps = max(latest // batch_size, 1)
        else:
            train_steps = int(self.args.train_steps_per_iteration)
        if jax.process_count() > 1:
            # Per-host sample counts differ; every host must run the same
            # number of jitted steps or the collective program deadlocks.
            from jax.experimental import multihost_utils

            train_steps = int(multihost_utils.process_allgather(
                np.array(train_steps)).min())

        n_sym = sym_env.NUM_SYMMETRIES if device_sym else 1

        if use_window:
            # No silent caps: say so when the ring could not hold the whole
            # configured window (it degrades to the most recent rows).
            expected_rows = window_units // n_sym
            if len(phys) < expected_rows:
                print(f"[device-window] window degraded: {len(phys)} of "
                      f"{expected_rows} rows resident (ring capacity "
                      f"{self._dev_window.rows}); raise deviceWindowRows "
                      f"to keep the full window")
            bufs = self._dev_window.buffers
            resident_rows = len(phys)

            def batches():
                # Same shuffled-epochs-without-replacement distribution as
                # batch_iterator, drawn by the same host Generator — only
                # the row gather moved on device.
                while True:
                    order = self._np_rng.permutation(len(phys))
                    end = len(phys) - (len(phys) % batch_size)
                    if end == 0:
                        end = len(phys)  # tiny window: one short batch
                    for s0 in range(0, end, batch_size):
                        idx = phys[order[s0:s0 + batch_size]]
                        b = bufs + (idx,)
                        if device_sym:
                            b = b + (self._np_rng.integers(
                                0, n_sym, size=len(idx), dtype=np.int32),)
                        yield b
        else:
            resident_rows = len(data[0])

            def batches():
                while True:
                    for b in batch_iterator(data, batch_size, self._np_rng):
                        if device_sym:
                            b = b + (self._np_rng.integers(
                                0, n_sym, size=len(b[0]), dtype=np.int32),)
                        yield b

        from alphazero_general_tpu.utils.misc import Bar

        bar = Bar(f"Train iter {iteration}", max=train_steps)

        def _progress(step, total, lpi, lv):
            bar.suffix = f"lpi {lpi:.3f} lv {lv:.3f}"
            bar.goto(step)

        self.loss_pi, self.loss_v = self.train_net.train(
            batches(), train_steps, iteration=iteration, callback=_progress
        )
        bar.finish()
        # Epoch/coverage accounting (VERDICT r3 item 2): how much of the
        # window the model actually saw this iteration — the reference's
        # implicit accounting is autoTrainSteps itself (Coach.py:475-477);
        # here it is explicit so under-training is visible on the curves.
        seen = train_steps * batch_size
        self.writer.add_scalar("train/window_samples", window_units,
                               iteration)
        self.writer.add_scalar("train/samples_seen", seen, iteration)
        self.writer.add_scalar("train/effective_epochs",
                               seen / max(window_units, 1), iteration)
        self.writer.add_scalar("train/window_rows_resident", resident_rows,
                               iteration)
        self.writer.add_scalar("loss/policy", self.loss_pi, iteration)
        self.writer.add_scalar("loss/value", self.loss_v, iteration)
        self.writer.add_scalar(
            "loss/total", self.loss_pi + self.loss_v, iteration
        )
        self._save_model(self.train_net, iteration)
        self.state = TrainState.STANDBY

    def _train_on_past_data(self, iteration: int) -> None:
        """One-shot chunked pre-training from a previous run's sample files
        (Coach.py:486-505)."""
        from math import ceil

        past = ReplayStore(self.args.data, self.args.past_data_run_name)
        total_iters = past.num_iterations()
        chunk = int(self.args.past_data_chunk_size)
        num_chunks = ceil(total_iters / chunk) if total_iters else 0
        print(f'Training on past data from run '
              f'"{self.args.past_data_run_name}" in {num_chunks} chunks of '
              f'{chunk} iterations ({total_iters} iterations in total).')
        self.train_net.set_device_window(False)  # chunked host feed
        batch_size = int(self.args.train_batch_size)
        start = 1
        for _ in range(num_chunks):
            end = min(start + chunk - 1, total_iters)
            data = past.load_window(
                start, end,
                max_samples=int(self.args.get("maxWindowSamples", 4_000_000)),
                rng=self._np_rng,
                symmetric_env=(self.env if bool(self.args.symmetricSamples)
                               and self.env.NUM_SYMMETRIES > 1 else None))
            start = end + 1
            if data is None:
                continue
            train_steps = max(len(data[0]) // batch_size, 1)  # train_on_all

            def batches():
                while True:
                    yield from batch_iterator(data, batch_size, self._np_rng)

            self.loss_pi, self.loss_v = self.train_net.train(
                batches(), train_steps, iteration=iteration
            )
        self.writer.add_scalar("loss/policy", self.loss_pi, iteration)
        self.writer.add_scalar("loss/value", self.loss_v, iteration)
        self.writer.add_scalar(
            "loss/total", self.loss_pi + self.loss_v, iteration
        )
        self._save_model(self.train_net, iteration)

    # ------------------------------------------------------------ evaluation
    def _get_arena_fn(self, num_games: int, baseline: bool,
                      quant: bool = False):
        cfg = ArenaConfig.from_args(
            self.args, self.env.NUM_PLAYERS, self.env.HAS_DRAW
        )
        apply_b = None
        if baseline:
            apply_b = raw_mcts_apply(
                self.env.ACTION_SIZE,
                self.env.NUM_PLAYERS + int(self.env.HAS_DRAW),
            )
        if quant:
            from alphazero_general_tpu.models.quant import quant_apply

            apply_fn = quant_apply  # both seats int8 via the same apply
        else:
            apply_fn = self._apply_fn()
        return make_arena_fn(
            self.env, cfg, apply_fn, num_games, apply_fn_b=apply_b,
            mesh=self.mesh,
        )

    def _try_quant(self, net: NNetWrapper, iteration: int):
        """Int8 inference params for arena evaluation (args.quant_arena —
        the arenas then measure the same tower self-play deploys,
        VERDICT.md weak#1). None → bf16 fallback."""
        if not bool(self.args.get("quant_arena", True)) \
                or not bool(self.args.get("quant_selfplay", False)) \
                or self._quant_ok is False:
            return None
        try:
            qp, _ = net.quantized_inference(
                calib_obs=self._quant_calib_obs(iteration),
                rng=self._next_rng())
            self._quant_ok = True
            return qp
        except ValueError:
            self._quant_ok = False
            return None

    def compare_to_past(self, model_iter: int) -> None:
        """Arena vs the gated self-play model + gating decision
        (Coach.py:527-572)."""
        self.state = TrainState.COMPARE_PAST
        self._load_model(self.self_play_net, self.self_play_iter)
        print(f"PITTING AGAINST ITERATION {self.self_play_iter}")

        # Int8 on BOTH seats when available (symmetric; matches the tower
        # self-play actually deploys). bf16 fallback otherwise.
        vars_a = self._try_quant(self.train_net, model_iter)
        quant = vars_a is not None
        vars_b = (self._try_quant(self.self_play_net, model_iter)
                  if quant else None)
        quant = quant and vars_b is not None
        if not quant:
            vars_a = self.train_net.state.variables
            vars_b = self.self_play_net.state.variables
        if self.mesh is not None:
            from alphazero_general_tpu.parallel.mesh import replicate_tree

            vars_a = replicate_tree(vars_a, self.mesh)
            vars_b = replicate_tree(vars_b, self.mesh)
        key = "q" if quant else "f"
        if self._arena_fn is None:
            self._arena_fn = {}
        if key not in self._arena_fn:
            self._arena_fn[key] = self._get_arena_fn(
                int(self.args.arenaCompare), baseline=False, quant=quant
            )
        result = self._arena_fn[key](vars_a, vars_b, self._next_rng())
        wr = np.asarray(winrates(result, self.args.use_draws_for_winrate))
        winrate = float(wr[0])
        wins = np.asarray(result.model_wins)
        draws = float(result.draws)
        print(f"NEW/PAST WINS : {wins[0]:.0f} / {wins[1]:.0f} ; "
              f"DRAWS : {draws:.0f}")
        print(f"NEW MODEL WINRATE : {round(winrate, 3)}")
        self.writer.add_scalar("win_rate/past", winrate, model_iter)
        decided = float(wins[0]) + float(wins[1])
        wr_decided = float(wins[0]) / max(decided, 1.0)
        self.writer.add_scalar("win_rate/past_decided", wr_decided,
                               model_iter)

        # Gating (Coach.py:558-572). Rule "decided" scores only decided
        # games (args.gatingRule — draw-heavy envs pin the half-credit
        # winrate near 0.5; see utils/config.py and results/r5/gating_ab.md).
        if str(self.args.get("gatingRule", "reference")) == "decided":
            gate_pass = (
                decided >= int(self.args.get("gateMinDecided", 16))
                and wr_decided >= self.args.min_next_model_winrate
            )
            print(f"GATE (decided rule): {wr_decided:.3f} over "
                  f"{decided:.0f} decided games -> "
                  f"{'PROMOTE' if gate_pass else 'keep'}")
        else:
            gate_pass = winrate >= self.args.min_next_model_winrate
        if (
            self.args.model_gating
            and not gate_pass
            and (self.args.max_gating_iters is None
                 or self.gating_counter < self.args.max_gating_iters)
        ):
            self.gating_counter += 1
        elif self.args.model_gating:
            self.self_play_iter = model_iter
            self._load_model(self.self_play_net, self.self_play_iter)
            self.gating_counter = 0
        if self.args.model_gating:
            print(f"Using model version {self.self_play_iter} for self play.")
        self.state = TrainState.STANDBY

    def compare_to_baseline(self, iteration: int) -> None:
        """Arena vs the model-free RawMCTS baseline (Coach.py:574-590)."""
        self.state = TrainState.COMPARE_BASELINE
        print("PITTING AGAINST BASELINE: RawMCTS")
        vars_a = self._try_quant(self.train_net, iteration)
        quant = vars_a is not None
        if not quant:
            vars_a = self.train_net.state.variables
        if self.mesh is not None:
            from alphazero_general_tpu.parallel.mesh import replicate_tree

            vars_a = replicate_tree(vars_a, self.mesh)
        key = "q" if quant else "f"
        if self._baseline_fn is None:
            self._baseline_fn = {}
        if key not in self._baseline_fn:
            self._baseline_fn[key] = self._get_arena_fn(
                int(self.args.arenaCompareBaseline), baseline=True,
                quant=quant,
            )
        result = self._baseline_fn[key](vars_a, {}, self._next_rng())
        wr = np.asarray(winrates(result, self.args.use_draws_for_winrate))
        winrate = float(wr[0])
        wins = np.asarray(result.model_wins)
        print(f"NEW/BASELINE WINS : {wins[0]:.0f} / {wins[1]:.0f} ; "
              f"DRAWS : {float(result.draws):.0f}")
        print(f"NEW MODEL WINRATE : {round(winrate, 3)}")
        self.writer.add_scalar("win_rate/baseline", winrate, iteration)
        self.state = TrainState.STANDBY
