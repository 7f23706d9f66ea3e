from .registry import Query, all_queries, bench_queries, register

__all__ = ["Query", "all_queries", "bench_queries", "register"]
