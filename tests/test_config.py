"""Config composition semantics (parity with reference parser.py:23-60)."""

import textwrap

from treelearn_tpu.config import ConfigDict, config_to_dict, get_config


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_default_args_merge(tmp_path):
    _write(
        tmp_path,
        "base.yaml",
        """
        model:
          channels: 32
          spatial_shape: ~
          nested:
            a: 1
            b: 2
        other: hello
        """,
    )
    main = _write(
        tmp_path,
        "main.yaml",
        f"""
        default_args: ["{tmp_path}/base.yaml"]
        model:
          spatial_shape: [500, 500, 1000]
          nested:
            b: 7
        epochs: 3
        """,
    )
    cfg = get_config(main)
    # include keys folded in, with main-config nested overrides applied
    assert cfg.model.channels == 32
    assert cfg.model.spatial_shape == [500, 500, 1000]
    assert cfg.model.nested.a == 1
    assert cfg.model.nested.b == 7
    assert cfg.other == "hello"
    assert cfg.epochs == 3


def test_configdict_attr_access_and_roundtrip():
    cfg = ConfigDict.from_dict({"a": {"b": [1, {"c": 2}]}})
    assert cfg.a.b[1].c == 2
    cfg.a.d = 5
    plain = config_to_dict(cfg)
    assert plain == {"a": {"b": [1, {"c": 2}], "d": 5}}
    assert type(plain["a"]) is dict
