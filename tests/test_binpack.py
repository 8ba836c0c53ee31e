import pytest

from multiomix_aws_emr_spark.plans.binpack import (
    bin_loads,
    greedy_bin_assignment,
    sequential_bin_assignment,
)


def test_greedy_golden():
    costs = {0: 5.0, 1: 3.0, 2: 2.0, 3: 2.0}
    a = greedy_bin_assignment(costs, 2)
    assert a == {0: 0, 1: 1, 2: 1, 3: 0}
    assert bin_loads(costs, a, 2) == [7.0, 5.0]


def test_greedy_deterministic_and_balanced():
    costs = {i: float((i * 7) % 13 + 1) for i in range(50)}
    a1 = greedy_bin_assignment(costs, 4)
    a2 = greedy_bin_assignment(costs, 4)
    assert a1 == a2
    loads = bin_loads(costs, a1, 4)
    # LPT guarantee: max load <= (4/3 - 1/3m) * optimal; just sanity-check
    # spread is tight for this uniform-ish input.
    assert max(loads) - min(loads) <= max(costs.values())


def test_negative_cost_aborts():
    # mirrors the reference's negative-prediction guard (R32)
    with pytest.raises(ValueError, match="negative"):
        greedy_bin_assignment({0: 1.0, 1: -0.5}, 2)


def test_sequential_partitioner():
    # key * W // N (metaheuristics.py:290)
    assert sequential_bin_assignment([0, 1, 2, 3], 2) == {0: 0, 1: 0, 2: 1, 3: 1}
    assert sequential_bin_assignment([], 3) == {}
    assert set(sequential_bin_assignment(list(range(10)), 3).values()) == {0, 1, 2}
