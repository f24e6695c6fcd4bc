"""Table profiling (stages/profile.py)."""

import numpy as np
import pandas as pd


def test_table_profile_hand_case(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.profile import table_profile

    df = pd.DataFrame({
        "a": [1.0, 2.5, 2.5, None, 7.0],
        "b": ["x", "y", "x", "z", None],
        "c": np.arange(5, dtype=np.int64),
    })
    out = (table_profile(rd.from_pandas(df).repartition(3), ["a", "b", "c"])
           .to_pandas().set_index("column"))
    assert out.loc["a", "n_rows"] == 5
    assert out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3
    assert out.loc["a", "min_v"] == "1.0"
    assert out.loc["a", "max_v"] == "7.0"
    assert out.loc["b", "n_null"] == 1
    assert out.loc["b", "n_distinct"] == 3
    assert out.loc["b", "min_v"] == "x" and out.loc["b", "max_v"] == "z"
    assert out.loc["c", "n_distinct"] == 5
    assert out.loc["c", "min_v"] == "0" and out.loc["c", "max_v"] == "4"


def test_table_profile_all_null_column(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.profile import table_profile

    df = pd.DataFrame({"a": [None, None], "b": [1.0, 2.0]})
    out = (table_profile(rd.from_pandas(df), ["a", "b"])
           .to_pandas().set_index("column"))
    assert out.loc["a", "n_null"] == 2
    assert out.loc["a", "n_distinct"] == 0
    assert out.loc["a", "min_v"] is None
