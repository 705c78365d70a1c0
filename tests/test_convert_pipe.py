"""stdin/stdout piping of the convert CLI — mirrors the reference's
open_or_stdin (src/readers/mod.rs:60-68) / stdout default
(src/main.rs:176-184) pipe-composition usage."""

import subprocess
import sys


OPL = (
    "n1 v1 dV c1 t2020-01-01T00:00:00Z i1 uu T"
    "highway=residential,name=Main%20%St x-1.5 y2.25\n"
    "n2 v1 dV c1 t2020-01-01T00:00:00Z i1 uu Thighway=primary x0.5 y1.0\n"
    "w3 v1 dV c1 t2020-01-01T00:00:00Z i1 uu Thighway=residential "
    "Nn1,n2\n"
)

FILTER = 'OSMFilter v0.2.0\n\nEQUALS "highway" "residential"\n\tCOMMIT\nDROP\n'


def _run(args, stdin_bytes):
    return subprocess.run(
        [sys.executable, "-m", "skyway_ray.pipelines.convert", *args],
        input=stdin_bytes, capture_output=True, timeout=300)


def test_pipe_roundtrip_with_filter(tmp_path):
    f = tmp_path / "f.osmfilter"
    f.write_text(FILTER)
    r = _run(["-", "-", "--from", "opl", "--to", "opl",
              "--filter", str(f)], OPL.encode())
    assert r.returncode == 0, r.stderr.decode()
    lines = r.stdout.decode().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("n1 ")
    assert lines[1].startswith("w3 ")
    assert "highway=residential" in lines[0]


def test_stdin_requires_format():
    r = _run(["-", "/tmp/out_nowhere"], b"")
    assert r.returncode == 2
    assert b"--from" in r.stderr


def test_stdout_requires_format(tmp_path):
    src = tmp_path / "in.opl"
    src.write_text(OPL)
    r = _run([str(src), "-"], b"")
    assert r.returncode == 2
    assert b"--to" in r.stderr


def test_named_input_output_flags(tmp_path):
    """The reference CLI takes --input/--output as named flags
    (src/main.rs:68-74) — both spellings work."""
    src = tmp_path / "in.opl"
    src.write_text(OPL)
    out = tmp_path / "out_opl"
    r = _run(["--input", str(src), "--output", str(out), "--to", "opl"], b"")
    assert r.returncode == 0, r.stderr.decode()
    assert b"wrote 3 elements" in r.stdout


def test_to_overpass_shortname(tmp_path):
    """`--to overpass` (the reference's writer shortname) selects the
    Overpass JSON header (docs/src/usage.md format table)."""
    src = tmp_path / "in.opl"
    src.write_text(OPL)
    r = _run([str(src), "-", "--to", "overpass"], b"")
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode()
    assert out.startswith('{"') and '"osm3s"' in out.split("elements")[0]
