from oracle.oracle import Oracle, build_oracle  # noqa: F401
