"""Package placeholder; populated by the build plan."""
