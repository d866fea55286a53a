"""Single-threaded pure-Python oracle crawler (SURVEY §5.2.1)."""
