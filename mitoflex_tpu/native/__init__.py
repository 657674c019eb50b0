"""Native host runtime (C++).

Compiled lazily with the in-tree Makefile on first use; every consumer has
a pure-Python fallback, so a missing toolchain degrades performance, not
functionality."""
