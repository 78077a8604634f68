"""TaggedTasks registry tests (reference: utils/containers_test.py)."""

import pytest

from dm_control_tpu.utils import containers


def test_add_and_tags():
    tasks = containers.TaggedTasks()

    @tasks.add("easy", "benchmarking")
    def first():
        return 1

    @tasks.add("hard")
    def second():
        return 2

    assert list(tasks) == ["first", "second"]
    assert tasks["first"]() == 1
    assert set(tasks.tagged("easy")) == {"first"}
    assert set(tasks.tagged("hard")) == {"second"}
    assert set(tasks.tagged()) == {"first", "second"}
    assert set(tasks.tagged("easy", "benchmarking")) == {"first"}
    assert set(tasks.tagged("easy", "hard")) == set()
    assert set(tasks.tags()) == {"easy", "hard", "benchmarking"}


def test_duplicate_name_rejected():
    tasks = containers.TaggedTasks()

    @tasks.add()
    def task():
        pass

    with pytest.raises(ValueError):
        @tasks.add()
        def task():  # noqa: F811
            pass
