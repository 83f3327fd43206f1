"""The shipped example project runs end-to-end (reference
`examples/some_activity/project.py` parity)."""

import sys


def test_example_project_ticks(spark, tmp_path):
    sys.path.insert(0, "examples")
    try:
        import project as ex
    finally:
        sys.path.pop(0)
    watch = tmp_path / "in"
    watch.mkdir()
    (watch / "hello.txt").write_text("hi")
    (watch / "skip.bin").write_text("no")
    reg = ex.build_project(spark, str(tmp_path / "stores"), str(watch))
    assert sorted(reg.names()) == ["periodic", "watch_txt"]
    assert ex.run_periodic_tick(spark, reg) == 1
    assert ex.run_watch_tick(spark, reg, str(watch)) == 1
    _, store = reg.get("watch_txt")
    row = store.search(text="hi").collect()[0]
    assert row["state"] == "processed"
    assert row["meta"]["filename"] == "hello.txt"
