"""Store command-line utilities (reference ``pypeman/tools/``)."""
