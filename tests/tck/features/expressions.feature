Feature: Scalar expressions (TCK expressions/comparison, string, math corners)

  Scenario: Integer division truncates, float division does not
    Given an empty graph
    When executing query:
      """
      RETURN 7 / 2 AS intdiv, 7.0 / 2 AS floatdiv, 7 % 2 AS mod
      """
    Then the result should be, in any order:
      | intdiv | floatdiv | mod |
      | 3      | 3.5      | 1   |

  Scenario: Exponentiation returns float
    Given an empty graph
    When executing query:
      """
      RETURN 2 ^ 10 AS p
      """
    Then the result should be, in any order:
      | p      |
      | 1024.0 |

  Scenario: Unary minus and sign
    Given an empty graph
    When executing query:
      """
      RETURN -(-5) AS a, sign(-3) AS s, sign(0) AS z, abs(-2.5) AS ab
      """
    Then the result should be, in any order:
      | a | s  | z | ab  |
      | 5 | -1 | 0 | 2.5 |

  Scenario: Plus concatenates strings and mixed string-number
    Given an empty graph
    When executing query:
      """
      RETURN 'a' + 'b' AS ss, 'n' + 1 AS sn, 1 + 'n' AS ns
      """
    Then the result should be, in any order:
      | ss   | sn   | ns   |
      | 'ab' | 'n1' | '1n' |

  Scenario: Chained comparison is conjunction
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 2 < 3 AS yes, 1 < 3 < 2 AS no
      """
    Then the result should be, in any order:
      | yes  | no    |
      | true | false |

  Scenario: Integer and float compare numerically
    Given an empty graph
    When executing query:
      """
      RETURN 1 = 1.0 AS eq, 2 > 1.5 AS gt
      """
    Then the result should be, in any order:
      | eq   | gt   |
      | true | true |

  Scenario: String comparison operators
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' STARTS WITH 'ab' AS sw, 'abc' ENDS WITH 'bc' AS ew,
             'abc' CONTAINS 'b' AS ct, 'abc' < 'abd' AS lt
      """
    Then the result should be, in any order:
      | sw   | ew   | ct   | lt   |
      | true | true | true | true |

  Scenario: Regex match full string
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' =~ 'ab.' AS yes, 'abc' =~ 'ab' AS partial
      """
    Then the result should be, in any order:
      | yes  | partial |
      | true | false   |

  Scenario: substring replace trim family
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 1, 3) AS sub, replace('aaa', 'a', 'b') AS rep,
             trim('  x  ') AS t, lTrim('  x') AS lt, rTrim('x  ') AS rt
      """
    Then the result should be, in any order:
      | sub   | rep   | t   | lt  | rt  |
      | 'ell' | 'bbb' | 'x' | 'x' | 'x' |

  Scenario: left right toUpper toLower reverse
    Given an empty graph
    When executing query:
      """
      RETURN left('hello', 2) AS l, right('hello', 2) AS r,
             toUpper('ab') AS u, toLower('AB') AS lo, reverse('abc') AS rev
      """
    Then the result should be, in any order:
      | l    | r    | u    | lo   | rev   |
      | 'he' | 'lo' | 'AB' | 'ab' | 'cba' |

  Scenario: toString on numbers and booleans
    Given an empty graph
    When executing query:
      """
      RETURN toString(42) AS i, toString(true) AS b
      """
    Then the result should be, in any order:
      | i    | b      |
      | '42' | 'true' |

  Scenario: round floor ceil
    Given an empty graph
    When executing query:
      """
      RETURN round(2.5) AS r, floor(2.9) AS f, ceil(2.1) AS c
      """
    Then the result should be, in any order:
      | r   | f   | c   |
      | 3.0 | 2.0 | 3.0 |

  Scenario: sqrt exp log
    Given an empty graph
    When executing query:
      """
      RETURN sqrt(16.0) AS s, exp(0.0) AS e, log(1.0) AS l
      """
    Then the result should be, in any order:
      | s   | e   | l   |
      | 4.0 | 1.0 | 0.0 |

  Scenario: toBoolean conversions
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('true') AS t, toBoolean('FALSE') AS f,
             toBoolean('nope') AS n
      """
    Then the result should be, in any order:
      | t    | f     | n    |
      | true | false | null |

  Scenario: Simple CASE with multiple WHENs
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.v AS v,
             CASE p.v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w
      ORDER BY v
      """
    Then the result should be, in order:
      | v | w      |
      | 1 | 'one'  |
      | 2 | 'two'  |
      | 3 | 'many' |

  Scenario: Searched CASE evaluates in order
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN 2 > 1 THEN 'first' WHEN true THEN 'second' END AS c
      """
    Then the result should be, in any order:
      | c       |
      | 'first' |

  Scenario: Date accessors
    Given an empty graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd, d.quarter AS q,
             d.dayOfWeek AS dow
      """
    Then the result should be, in any order:
      | y    | m | dd | q | dow |
      | 2024 | 3 | 15 | 1 | 5   |

  Scenario: duration between dates is calendar months first
    Given an empty graph
    When executing query:
      """
      RETURN duration.between(date('2024-01-01'), date('2024-03-01')).months AS m,
             duration.inDays(date('2024-01-01'), date('2024-03-01')).days AS d
      """
    Then the result should be, in any order:
      | m | d  |
      | 2 | 60 |

  Scenario: Date plus duration
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-01-31') + duration({days: 1}) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2024-02-01' |

  Scenario: Parameters in expressions
    Given an empty graph
    And parameters are:
      | x | 40       |
      | s | 'suffix' |
    When executing query:
      """
      RETURN $x + 2 AS n, 'pre' + $s AS str
      """
    Then the result should be, in any order:
      | n  | str         |
      | 42 | 'presuffix' |

  Scenario: id is stable within a query
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN id(p) = id(p) AS same
      """
    Then the result should be, in any order:
      | same |
      | true |

  Scenario: type of a relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:KNOWS {w: 1}]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t
      """
    Then the result should be, in any order:
      | t       |
      | 'KNOWS' |

  Scenario: properties of an entity as a map
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 'x'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN properties(p) AS m
      """
    Then the result should be, in any order:
      | m             |
      | {a: 1, b: 'x'} |

  Scenario: Division by zero is null (reference SQLite parity)
    Given an empty graph
    When executing query:
      """
      RETURN 1 / 0 AS boom
      """
    Then the result should be, in any order:
      | boom |
      | null |

  Scenario: Unknown function raises a syntax error
    Given an empty graph
    When executing query:
      """
      RETURN definitelyNotAFunction(1) AS x
      """
    Then a SyntaxError should be raised

  Scenario: Accessing an undefined variable raises a syntax error
    Given an empty graph
    When executing query:
      """
      RETURN nosuchvar.prop AS x
      """
    Then a SyntaxError should be raised

  Scenario: Unaliased property projection uses the expression text as its name
    Given an empty graph
    And having executed:
      """
      CREATE (:Zed {a: 5})
      """
    When executing query:
      """
      MATCH (n:Zed) RETURN n.a, n.a + 1 AS b
      """
    Then the result should be, in any order:
      | n.a | b |
      | 5   | 6 |
