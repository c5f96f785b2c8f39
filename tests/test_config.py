import os
import textwrap

import pytest

from navierstokes_parallel_tpu.config import Params, load_params

# A verbatim copy of the reference's parameter-file *format* (the contract
# from src/serial/io.c:12-59): 15 positional lines, trailing comments.
SAMPLE = textwrap.dedent(
    """\
    1           # problem
    1           # f
    257\t        # i_max
    257        # j_max
    1.0\t        # Side a length
    1.0\t        # Side b length
    1.0 \t    # Time to integrate
    10000.0 \t# Reynolds number
    0.0 \t    # x-component of g
    0.0 \t    # y-component of g
    1.0\t\t    # Security factor tau.
    1.7         # Relaxation factor for SOR.
    0.0001      # Relative tolerance for SOR.
    500         # Maximum iterations for SOR.
    1           # Print results to file every nth step.
    """
)


def test_parse_reference_format(tmp_path):
    f = tmp_path / "params.txt"
    f.write_text(SAMPLE)
    p = Params.from_file(str(f))
    assert p.problem == 1
    assert p.i_max == 257 and p.j_max == 257
    assert p.a == 1.0 and p.b == 1.0
    assert p.T == 1.0
    assert p.Re == 10000.0
    assert p.tau == 1.0
    assert p.omega == 1.7
    assert p.epsilon == 1e-4
    assert p.max_it == 500
    assert p.n_print == 1


def test_roundtrip(tmp_path):
    p = Params(problem=2, f=10.0, i_max=64, j_max=32, T=0.5, Re=250.0,
               max_it=123, epsilon=3e-5)
    path = tmp_path / "out.in"
    p.to_file(str(path))
    q = Params.from_file(str(path))
    for name in ("problem", "f", "i_max", "j_max", "a", "b", "T", "Re",
                 "g_x", "g_y", "tau", "omega", "epsilon", "max_it", "n_print"):
        assert getattr(p, name) == getattr(q, name), name


def test_parse_reference_repo_configs():
    """The actual benchmark configs shipped in configs/ must parse."""
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("1.in", "2.in", "3.in", "4.in", "parameters.txt"):
        p = Params.from_file(os.path.join(cfg_dir, name))
        assert p.i_max >= 256 or name == "parameters.txt"
        assert p.omega == 1.7


def test_derived():
    p = Params(i_max=128, j_max=64, a=2.0, b=1.0)
    assert p.dx == 2.0 / 128
    assert p.dy == 1.0 / 64
    assert p.shape == (130, 66)


def test_validation():
    with pytest.raises(ValueError):
        Params(problem=7)  # 3=channel, 4=free-slip, 5=convection,
    assert Params(problem=4).problem == 4    # 6=free surface are valid
    assert Params(problem=5).problem == 5
    assert Params(problem=6).fluid_x1 == 0.25  # derived dam-break default
    with pytest.raises(ValueError):
        Params(omega=2.5)
    with pytest.raises(ValueError):
        Params(i_max=1)


def test_overrides():
    p = Params()
    q = load_params(p, Re=42.0)
    assert q.Re == 42.0 and p.Re != 42.0
