"""_session_cache_get (ADVICE r8): cache identity must survive
id()-recycling of stopped SparkContexts, and entries from dead contexts
must be evicted + unpersisted, not accumulated."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import _session_cache_get


class FakeDF:
    def __init__(self):
        self.cached = False
        self.unpersisted = False

    def cache(self):
        self.cached = True
        return self

    def unpersist(self):
        self.unpersisted = True
        return self


class FakeSC:
    def __init__(self, app_id, start):
        self.applicationId = app_id
        self.startTime = start


class FakeSpark:
    def __init__(self, app_id, start):
        self.sparkContext = FakeSC(app_id, start)


def test_hit_within_same_session():
    cache = {}
    s = FakeSpark("app-1", 100)
    a = _session_cache_get(cache, s, "sf", FakeDF)
    b = _session_cache_get(cache, s, "sf", FakeDF)
    assert a is b and a.cached


def test_distinct_sf_coexist():
    cache = {}
    s = FakeSpark("app-1", 100)
    a = _session_cache_get(cache, s, "sf0.01", FakeDF)
    b = _session_cache_get(cache, s, "sf0.1", FakeDF)
    assert a is not b and len(cache) == 2


def test_new_context_evicts_and_unpersists_old_entries():
    """The r8 failure: a recycled id() returned a DataFrame bound to a
    dead session. A different (applicationId, startTime) must rebuild,
    and the dead entry must leave the cache (unpersisted)."""
    cache = {}
    old = _session_cache_get(cache, FakeSpark("app-1", 100), "sf", FakeDF)
    new = _session_cache_get(cache, FakeSpark("app-2", 200), "sf", FakeDF)
    assert new is not old
    assert old.unpersisted
    assert len(cache) == 1  # no accumulation across sessions


def test_same_app_restarted_distinguished_by_start_time():
    cache = {}
    old = _session_cache_get(cache, FakeSpark("app-1", 100), "sf", FakeDF)
    new = _session_cache_get(cache, FakeSpark("app-1", 999), "sf", FakeDF)
    assert new is not old and old.unpersisted
