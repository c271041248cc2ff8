"""Synthesize tiny COLR-v0 and variable test fonts with fontTools."""
from fontTools.fontBuilder import FontBuilder
from fontTools.pens.ttGlyphPen import TTGlyphPen


def _square(x0, y0, x1, y1):
    pen = TTGlyphPen(None)
    pen.moveTo((x0, y0)); pen.lineTo((x1, y0)); pen.lineTo((x1, y1))
    pen.lineTo((x0, y1)); pen.closePath()
    return pen.glyph()


def build_colr_font(path):
    fb = FontBuilder(1000, isTTF=True)
    glyphs = [".notdef", "emoji", "back", "front"]
    fb.setupGlyphOrder(glyphs)
    fb.setupCharacterMap({ord("A"): "emoji"})
    fb.setupGlyf({".notdef": _square(0, 0, 10, 10),
                  "emoji": _square(100, 100, 900, 800),
                  "back": _square(100, 100, 900, 800),
                  "front": _square(300, 300, 700, 600)})
    fb.setupHorizontalMetrics({".notdef": (1000, 0), "emoji": (1000, 100),
                               "back": (1000, 100), "front": (1000, 300)})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "ColrTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    fb.setupCOLR({"emoji": [("back", 0), ("front", 1)]})
    fb.setupCPAL([[(1.0, 0.2, 0.1, 1.0), (0.1, 0.4, 1.0, 1.0)]])  # RGBA 0-1
    fb.save(path)


def build_var_font(path):
    from fontTools.ttLib.tables.TupleVariation import TupleVariation
    fb = FontBuilder(1000, isTTF=True)
    glyphs = [".notdef", "box"]
    fb.setupGlyphOrder(glyphs)
    fb.setupCharacterMap({ord("B"): "box"})
    fb.setupGlyf({".notdef": _square(0, 0, 10, 10),
                  "box": _square(100, 100, 500, 700)})
    fb.setupHorizontalMetrics({".notdef": (1000, 0), "box": (1000, 100)})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "VarTest", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    fb.setupFvar([("wght", 100, 400, 900, "Weight")], [])
    # at wght=900 the box widens by 300 units on its right edge
    # (4 outline points + 4 phantom points)
    deltas = [(0, 0), (300, 0), (300, 0), (0, 0), None, None, None, None]
    tv = TupleVariation({"wght": (0.0, 1.0, 1.0)}, deltas)
    fb.setupGvar({"box": [tv]})
    fb.save(path)


if __name__ == "__main__":
    build_colr_font("/tmp/colr_test.ttf")
    build_var_font("/tmp/var_test.ttf")
    print("built")
