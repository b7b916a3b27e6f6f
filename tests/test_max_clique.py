"""Native max-clique solver vs brute force on random graphs."""

import itertools

import numpy as np
import pytest

from pointdsc_tpu.native import max_clique


def brute_force_max_clique(n, adj):
    best = []
    for r in range(n, 0, -1):
        if r <= len(best):
            break
        for combo in itertools.combinations(range(n), r):
            if all(adj[u][v] for u, v in itertools.combinations(combo, 2)):
                return list(combo)
    return best


def edges_from_adj(adj, n):
    ei, ej = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if adj[i][j]:
                ei.append(i)
                ej.append(j)
    return np.asarray(ei, np.int32), np.asarray(ej, np.int32)


class TestMaxClique:
    def test_triangle_plus_edge(self):
        # 0-1-2 triangle, 3-4 edge
        ei = np.asarray([0, 0, 1, 3], np.int32)
        ej = np.asarray([1, 2, 2, 4], np.int32)
        clique = sorted(max_clique(ei, ej, 5).tolist())
        assert clique == [0, 1, 2]

    def test_complete_graph(self):
        n = 10
        ei, ej = zip(*itertools.combinations(range(n), 2))
        clique = max_clique(np.asarray(ei, np.int32), np.asarray(ej, np.int32), n)
        assert sorted(clique.tolist()) == list(range(n))

    @pytest.mark.parametrize("p", [0.3, 0.6, 0.9])
    def test_random_graphs_match_bruteforce(self, rng, p):
        n = 14
        for _ in range(5):
            adj = rng.random((n, n)) < p
            adj = np.triu(adj, 1)
            adj = adj | adj.T
            ei, ej = edges_from_adj(adj, n)
            if len(ei) == 0:
                continue
            ours = max_clique(ei, ej, n)
            expect = brute_force_max_clique(n, adj)
            assert len(ours) == len(expect)
            # verify it is actually a clique
            for u, v in itertools.combinations(ours.tolist(), 2):
                assert adj[u][v]

    def test_planted_clique(self, rng):
        """Large sparse graph with a planted 12-clique."""
        n = 300
        adj = rng.random((n, n)) < 0.05
        adj = np.triu(adj, 1)
        planted = rng.choice(n, 12, replace=False)
        for u, v in itertools.combinations(sorted(planted), 2):
            adj[u][v] = True
        adj = adj | adj.T
        ei, ej = edges_from_adj(adj, n)
        ours = max_clique(ei, ej, n)
        assert len(ours) >= 12
        for u, v in itertools.combinations(ours.tolist(), 2):
            assert adj[u][v]
