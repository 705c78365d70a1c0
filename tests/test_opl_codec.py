"""Codec unit vectors ported from the reference tests (FIXTURES.md §5)."""

from skyway_ray.functions.opl_codec import (
    escape_opl, should_escape_char, unescape_opl,
)


class TestUnescape:
    # /root/reference/src/readers/opl.rs:244-256
    def test_reference_vectors(self):
        assert unescape_opl("%20%") == " "
        assert unescape_opl("%2c%") == ","
        assert unescape_opl("%2c%%2c%") == ",,"
        assert unescape_opl("%1f631%") == "\U0001F631"
        assert unescape_opl("%12108%") == "\U00012108"

    def test_mixed_and_invalid(self):
        assert unescape_opl("A%2c%B") == "A,B"
        assert unescape_opl("no escapes") == "no escapes"
        assert unescape_opl("%zz%x") == "x"      # invalid hex dropped
        assert unescape_opl("%20") == " "        # unterminated, parsed to EOS
        assert unescape_opl("%%") == ""          # empty hex dropped


class TestEscape:
    # /root/reference/src/writers/opl.rs:193-234
    def test_reference_char_vectors(self):
        assert escape_opl(" ") == "%20%"
        assert escape_opl(",") == "%2c%"
        assert escape_opl("\U0001F631") == "%1f631%"
        assert escape_opl("\U00012108") == "%12108%"

    def test_should_escape(self):
        for c in [" ", "\n", ",", "=", "@", "%", "\U0001F631"]:
            assert should_escape_char(c)
        for c in ["A", "z", "0", "!", "$", "&", "+", "-", "<", ">", "?", "~",
                  "¡", "Ā"]:
            assert not should_escape_char(c)

    def test_reference_string_vectors(self):
        assert escape_opl("A,B") == "A%2c%B"
        assert escape_opl("ohmy\U0001F631goodness") == "ohmy%1f631%goodness"

    def test_roundtrip(self):
        for s in ["hello world", "a=b,c@d", "čafé \U0001F631 𒄈", "100%", ""]:
            assert unescape_opl(escape_opl(s)) == s
