"""Bayesian-optimization node-selection algorithms.

Re-design of the reference's BO zoo (reference
experiments/graph_bo/utils/bo_utils.py:14-291 — the canonical copy; a second
near-duplicate lives at experiments/sparse/scalable_bo/bo_utils/
bo_algorithms.py, deliberately unified here):

  * Graph-traversal baselines (Random/BFS/DFS/Greedy) are host-side frontier
    bookkeeping over the CSR adjacency — inherently sequential control flow,
    kept in NumPy (they do no FLOPs worth accelerating).
  * ``GRFThompson`` is the compute path: GRF-GP Thompson sampling via
    pathwise conditioning (reference SparseGRF, bo_utils.py:213-291), with
    the same retrain-interval model caching, restricted to unvisited nodes —
    running on TPU through the shared Features/iterative-GP stack.
"""
from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import List, Optional, Sequence

import numpy as np


class Algorithm(ABC):
    """select_next_points/update protocol (reference bo_utils.py:14-25)."""

    def __init__(self, n_nodes: int, rng: np.random.Generator):
        self.n_nodes = n_nodes
        self.rng = rng

    @abstractmethod
    def select_next_points(
        self, observed_idx: np.ndarray, observed_y: np.ndarray, batch_size: int = 1
    ) -> List[int]:
        ...

    def update(self, observed_idx: np.ndarray, observed_y: np.ndarray) -> None:
        pass


class RandomSearch(Algorithm):
    def select_next_points(self, observed_idx, observed_y, batch_size=1):
        return self.rng.choice(self.n_nodes, size=batch_size, replace=False).tolist()


class _TraversalBase(Algorithm):
    def __init__(self, adjacency_csr, n_nodes, rng):
        super().__init__(n_nodes, rng)
        self.adj = adjacency_csr.tocsr()
        self.visited: set = set()

    def _neighbors(self, node: int) -> List[int]:
        return self.adj.indices[
            self.adj.indptr[node] : self.adj.indptr[node + 1]
        ].tolist()

    def _random_unvisited(self, exclude: set) -> Optional[int]:
        """A uniformly random node outside visited∪exclude.

        Rejection sampling: at BO scale (visited ≪ N — the flagship is 1e6
        nodes, a few thousand visited) the first draw almost always lands.
        Materializing ``set(range(N)) − visited`` instead cost ~seconds PER
        dry-frontier event at N=1e6 and dominated whole BFS/DFS cells.
        Falls back to the exact set difference only when rejection keeps
        missing (nearly-exhausted graph)."""
        for _ in range(64):
            cand = int(self.rng.integers(self.n_nodes))
            if cand not in self.visited and cand not in exclude:
                return cand
        unvisited = list(set(range(self.n_nodes)) - self.visited - exclude)
        if not unvisited:
            return None
        return int(self.rng.choice(unvisited))

    def update(self, observed_idx, observed_y):
        self.visited.update(int(i) for i in observed_idx)


class BFS(_TraversalBase):
    """FIFO frontier expansion (reference bo_utils.py:33-96).

    A parallel membership set mirrors the queue (the reference's
    ``nb not in self.queue`` list scan is O(q) per neighbor) and dry-frontier
    restarts draw via rejection sampling — see _random_unvisited."""

    _POP_INDEX = 0  # FIFO; DFS overrides to -1

    def __init__(self, adjacency_csr, n_nodes, rng):
        super().__init__(adjacency_csr, n_nodes, rng)
        self.queue: List[int] = []
        self._queued: set = set()

    def _expand_from(self, node, selected):
        for nb in self._neighbors(node):
            if (
                nb not in self.visited
                and nb not in self._queued
                and nb not in selected
            ):
                self.queue.append(nb)
                self._queued.add(nb)

    def _prune(self):
        self.queue = [n for n in self.queue if n not in self.visited]
        self._queued = set(self.queue)

    def select_next_points(self, observed_idx, observed_y, batch_size=1):
        if not self.queue:
            self._expand_from(int(self.rng.choice(observed_idx)), set())
        self._prune()
        selected: List[int] = []
        sel_set: set = set()
        while len(selected) < batch_size:
            if not self.queue:
                self._expand_from(int(self.rng.choice(observed_idx)), sel_set)
            if self.queue:
                node = self.queue.pop(self._POP_INDEX)
                self._queued.discard(node)
            else:
                node = self._random_unvisited(sel_set)
                if node is None:
                    break
            selected.append(node)
            sel_set.add(node)
        return selected

    def update(self, observed_idx, observed_y):
        super().update(observed_idx, observed_y)
        self._prune()


class DFS(BFS):
    """LIFO variant (reference bo_utils.py:98-157): pop from the end."""

    _POP_INDEX = -1


class GreedySearch(_TraversalBase):
    """Expand neighborhoods of the best observed nodes (reference
    bo_utils.py:159-211)."""

    def __init__(self, adjacency_csr, n_nodes, rng):
        super().__init__(adjacency_csr, n_nodes, rng)
        self.frontier: set = set()

    def select_next_points(self, observed_idx, observed_y, batch_size=1):
        observed_idx = np.asarray(observed_idx).astype(int)
        observed_y = np.asarray(observed_y)
        if not self.frontier:
            best = int(observed_idx[np.argmax(observed_y)])
            self.frontier.update(
                n for n in self._neighbors(best) if n not in self.visited
            )
        self.frontier -= self.visited
        if len(self.frontier) < batch_size:
            for ix in np.argsort(observed_y)[-3:]:
                node = int(observed_idx[ix])
                self.frontier.update(
                    n for n in self._neighbors(node) if n not in self.visited
                )
        self.frontier -= self.visited
        if self.frontier:
            selected = sorted(self.frontier)[:batch_size]
            self.frontier -= set(selected)
            return list(selected)
        selected: List[int] = []
        sel_set: set = set()
        for _ in range(batch_size):
            node = self._random_unvisited(sel_set)
            if node is None:
                break
            selected.append(node)
            sel_set.add(node)
        if selected:
            return selected
        take = min(batch_size, self.n_nodes)
        return self.rng.choice(self.n_nodes, size=take, replace=False).tolist()

    def update(self, observed_idx, observed_y):
        super().update(observed_idx, observed_y)
        self.frontier -= self.visited


def _next_capacity(size: int, minimum: int = 64) -> int:
    """Power-of-two observation capacity ≥ size (few distinct jit shapes)."""
    cap = minimum
    while cap < size:
        cap *= 2
    return cap


class GRFThompson(Algorithm):
    """GRF-GP Thompson sampling via pathwise conditioning on TPU.

    Reference SparseGRF (bo_utils.py:213-291): retrain the GP every
    ``retrain_interval`` new observations (Adam × train_epochs), then draw one
    posterior sample over the *unvisited* nodes and pick the top-k.

    Compile discipline: observations ride a fixed-capacity padded buffer
    (mask-aware MLL/pathwise, see gp.iterative.make_ktt_matvec_bm_masked) and
    Thompson samples are drawn at ALL nodes with visited ones excluded
    host-side — so the training and prediction graphs compile ONCE per
    capacity level instead of once per BO iteration. Pass
    ``observation_capacity`` (e.g. initial_points + iterations×batch) for a
    single compile across the whole run; otherwise capacity grows in
    powers of two.
    """

    def __init__(
        self,
        features,
        n_nodes: int,
        rng: np.random.Generator,
        *,
        kind: str = "free",
        learning_rate: float = 0.1,
        train_epochs: int = 50,
        retrain_interval: int = 10,
        settings=None,
        jax_seed: Optional[int] = None,
        observation_capacity: Optional[int] = None,
    ):
        super().__init__(n_nodes, rng)
        import jax

        from ..gp import iterative

        self.features = features
        self.kind = kind
        self.learning_rate = learning_rate
        self.train_epochs = train_epochs
        self.retrain_interval = retrain_interval
        self.settings = settings or iterative.CGSettings()
        self.observation_capacity = observation_capacity
        self.visited: set = set()
        self.cached_params = None
        self.last_training_size = 0
        if jax_seed is None:
            # derive from the per-BO-seed host rng: Thompson draws (and fit
            # init) must vary across protocol seeds — a fixed key made every
            # seed's GRF cell identical (regret std 0.0000 across 5 seeds)
            jax_seed = int(rng.integers(2**31 - 1))
        self._key = jax.random.PRNGKey(jax_seed)

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def _should_retrain(self, current_size: int) -> bool:
        return (
            self.cached_params is None
            or self.retrain_interval == 0
            or (current_size - self.last_training_size) >= self.retrain_interval
        )

    def _padded_observations(self, observed_idx, observed_y):
        size = observed_idx.size
        cap = self.observation_capacity
        if cap is None or cap < size:
            cap = _next_capacity(size)
        pad_idx = np.zeros(cap, np.int32)
        pad_idx[:size] = observed_idx
        pad_y = np.zeros(cap, np.float32)
        pad_y[:size] = observed_y
        mask = np.zeros(cap, np.float32)
        mask[:size] = 1.0
        return pad_idx, pad_y, mask

    def select_next_points(self, observed_idx, observed_y, batch_size=1):
        import jax.numpy as jnp

        from ..gp import iterative

        observed_idx = np.asarray(observed_idx).astype(np.int32)
        observed_y = np.asarray(observed_y, dtype=np.float32)
        pad_idx, pad_y, mask = self._padded_observations(observed_idx, observed_y)
        train_idx = jnp.asarray(pad_idx)
        y = jnp.asarray(pad_y)
        mask_j = jnp.asarray(mask)
        num_real = jnp.float32(observed_idx.size)

        if self._should_retrain(observed_idx.size):
            res = iterative.fit(
                self.features,
                train_idx,
                y,
                kind=self.kind,
                key=self._next_key(),
                init=self.cached_params,
                learning_rate=self.learning_rate,
                num_steps=self.train_epochs,
                settings=self.settings,
                mask=mask_j,
                num_real=num_real,
            )
            self.cached_params = res.params
            self.last_training_size = observed_idx.size

        # Thompson-sample at ALL nodes (static shape → one compile), then
        # exclude everything ever visited (tracked via update()) as well as
        # the currently-observed set host-side — the two can diverge when
        # batch selection outpaces observation (reference restricts Thompson
        # sampling to unvisited nodes, graph_bo/utils/bo_utils.py:269-276).
        sample = iterative.pathwise_predict(
            self.features,
            self.cached_params,
            train_idx,
            y,
            jnp.arange(self.n_nodes, dtype=jnp.int32),
            self._next_key(),
            kind=self.kind,
            num_samples=1,
            settings=self.settings,
            mask=mask_j,
        )[0]
        scores = np.asarray(sample, dtype=np.float32).copy()
        exclude = np.union1d(
            np.fromiter(self.visited, dtype=np.int32, count=len(self.visited)),
            observed_idx,
        ).astype(np.int32)
        scores[exclude] = -np.inf
        n_avail = self.n_nodes - exclude.size
        take = min(batch_size, max(n_avail, 0))
        if take == 0:
            return []
        top = np.argpartition(-scores, take - 1)[:take]
        return top[np.argsort(-scores[top])].tolist()

    def update(self, observed_idx, observed_y):
        self.visited.update(int(i) for i in observed_idx)
