from .explain import assert_broadcast_join, assert_no_cartesian, assert_pushed_filter, plan_string

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filter",
    "plan_string",
]
