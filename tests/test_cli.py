"""CLI smoke tests over the reference's in-repo matrices."""

import numpy as np
import pytest

from combblas_tpu.cli import main

SEVEN = "/root/reference/ReleaseTests/sevenvertex.mtx"
SMALL = "/root/reference/ReleaseTests/small_nonsym.mtx"


def test_cli_bfs(capsys):
    main(["bfs", SEVEN, "--root", "2"])
    assert "visited 7" in capsys.readouterr().out


def test_cli_cc(capsys):
    main(["cc", SEVEN])
    out = capsys.readouterr().out
    assert "1 components" in out


def test_cli_spgemm(tmp_path, capsys):
    out = str(tmp_path / "c.mtx")
    main(["spgemm", SEVEN, "-o", out])
    assert "nnz 17" in capsys.readouterr().out
    from combblas_tpu.io.mtx import read_mtx

    c = read_mtx(out)
    assert int(c.nnz) == 17


def test_cli_headerless_matrix(capsys):
    main(["match", SMALL, "--max"])
    assert "cardinality" in capsys.readouterr().out


def test_cli_gen_convert(tmp_path, capsys):
    b = str(tmp_path / "g.bin")
    m = str(tmp_path / "g.mtx")
    main(["gen", "--scale", "6", "-o", b])
    main(["convert", b, "-o", m])
    from combblas_tpu.io.binary import read_binary
    from combblas_tpu.io.mtx import read_mtx

    np.testing.assert_allclose(
        np.asarray(read_binary(b).to_dense()),
        np.asarray(read_mtx(m).to_dense()),
        rtol=1e-6,
    )


def test_labeled_tuples(tmp_path):
    from combblas_tpu.io.labels import read_labeled_tuples, write_labeled_tuples

    p = str(tmp_path / "g.txt")
    with open(p, "w") as f:
        f.write("protA protB 1.5\nprotB protC 2.0\nprotC protA 0.5\n")
    a, labels = read_labeled_tuples(p)
    assert labels == ["protA", "protB", "protC"]
    assert int(a.nnz) == 3
    d = np.asarray(a.to_dense())
    assert d[0, 1] == 1.5 and d[1, 2] == 2.0 and d[2, 0] == 0.5
    q = str(tmp_path / "out.txt")
    write_labeled_tuples(q, a, labels)
    b, labels2 = read_labeled_tuples(q)
    np.testing.assert_allclose(np.asarray(b.to_dense()), d)
