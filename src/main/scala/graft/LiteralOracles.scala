package graft

/** Literal expected rows for deterministic queries whose logic a SQL
  * oracle cannot re-derive (engine-native hashes/sketches) — generated
  * by tools/gen_literal_oracles.py from an actual sf0.01 run, valid
  * because each output is a partitioning-independent integer-valued
  * function of the fixed test data (see each query's Scaladoc). */
private[graft] object LiteralOracles {

  // 25 rows
  val t29: String = """SELECT a_id, b_id, jac_ppm
    FROM (VALUES
      (8, 245, 987804),
      (26, 455, 900000),
      (31, 383, 976190),
      (44, 446, 956521),
      (45, 267, 974025),
      (45, 413, 987012),
      (58, 293, 985714),
      (61, 185, 982456),
      (70, 447, 989130),
      (72, 377, 975609),
      (87, 134, 954545),
      (92, 450, 958333),
      (98, 290, 989130),
      (107, 387, 973684),
      (120, 332, 971428),
      (152, 178, 972972),
      (166, 323, 983333),
      (267, 413, 986842),
      (285, 301, 989130),
      (295, 374, 966666),
      (310, 389, 961538),
      (326, 457, 971428),
      (393, 420, 987341),
      (435, 486, 966666),
      (458, 462, 982758))
      AS t(a_id, b_id, jac_ppm)
    ORDER BY a_id, b_id"""

  // 17 rows
  val t30: String = """SELECT a_id, b_id, hamming
    FROM (VALUES
      (8, 245, 2),
      (45, 413, 3),
      (58, 293, 0),
      (61, 185, 0),
      (70, 447, 1),
      (76, 102, 2),
      (98, 290, 2),
      (107, 387, 1),
      (120, 332, 3),
      (166, 323, 3),
      (251, 473, 3),
      (267, 413, 2),
      (285, 301, 0),
      (326, 457, 2),
      (393, 420, 0),
      (435, 486, 3),
      (458, 462, 2))
      AS t(a_id, b_id, hamming)
    ORDER BY a_id, b_id"""

  // 13 rows
  val t45: String = """SELECT a_id, b_id, cos_ppm
    FROM (VALUES
      (7, 340, 492765),
      (28, 305, 456432),
      (44, 301, 459666),
      (53, 300, 452967),
      (75, 256, 456309),
      (156, 438, 474897),
      (158, 452, 471959),
      (166, 324, 473996),
      (169, 466, 512836),
      (238, 287, 451567),
      (290, 325, 458754),
      (338, 406, 482660),
      (387, 388, 466640))
      AS t(a_id, b_id, cos_ppm)
    ORDER BY a_id, b_id"""

  // 25 rows
  val t46: String = """SELECT a_id, b_id, shared_fps
    FROM (VALUES
      (8, 245, 95),
      (26, 455, 9),
      (31, 383, 55),
      (44, 446, 23),
      (45, 267, 91),
      (45, 413, 92),
      (58, 293, 73),
      (61, 185, 64),
      (70, 447, 107),
      (72, 377, 40),
      (87, 134, 26),
      (92, 450, 28),
      (98, 290, 109),
      (107, 387, 41),
      (120, 332, 41),
      (152, 178, 39),
      (166, 323, 71),
      (267, 413, 91),
      (285, 301, 114),
      (295, 374, 39),
      (310, 389, 30),
      (326, 457, 40),
      (393, 420, 98),
      (435, 486, 34),
      (458, 462, 63))
      AS t(a_id, b_id, shared_fps)
    ORDER BY a_id, b_id"""

  // 3 rows
  val t48: String = """SELECT kind, n, total_bytes, brightness_micro
    FROM (VALUES
      ('audio', 167, 50917, 61899830),
      ('image', 167, 52037, 61836069),
      ('video', 166, 46220, 61594816))
      AS t(kind, n, total_bytes, brightness_micro)
    ORDER BY kind"""

  // 14 rows
  val t65: String = """SELECT a_id, b_id, jac_ppm
    FROM (VALUES
      (8, 245, 987804),
      (26, 455, 900000),
      (45, 267, 974025),
      (45, 413, 987012),
      (61, 185, 982456),
      (70, 447, 989130),
      (92, 450, 958333),
      (98, 290, 989130),
      (120, 332, 971428),
      (285, 301, 989130),
      (295, 374, 966666),
      (310, 389, 961538),
      (393, 420, 987341),
      (435, 486, 966666))
      AS t(a_id, b_id, jac_ppm)
    ORDER BY a_id, b_id"""
}
