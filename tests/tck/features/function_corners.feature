Feature: Scalar function corners (TCK Functions; reference translator.ts
  scalar function emission)

  Scenario: toInteger parses and rejects
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('42') AS a, toInteger('abc') AS b,
             toInteger(3.9) AS c, toInteger('3.7') AS d
      """
    Then the result should be, in any order:
      | a  | b    | c | d |
      | 42 | null | 3 | 3 |

  Scenario: toFloat parses and rejects
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('2.5') AS a, toFloat('x') AS b, toFloat(7) AS c
      """
    Then the result should be, in any order:
      | a   | b    | c   |
      | 2.5 | null | 7.0 |

  Scenario: toBoolean parses and rejects
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('true') AS a, toBoolean('FALSE') AS b,
             toBoolean('nope') AS c, toBoolean(true) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    |
      | true | false | null | true |

  Scenario: toString of numbers and booleans
    Given an empty graph
    When executing query:
      """
      RETURN toString(42) AS a, toString(true) AS b, toString(1.5) AS c
      """
    Then the result should be, in any order:
      | a    | b      | c     |
      | '42' | 'true' | '1.5' |

  Scenario: Functions of null are null
    Given an empty graph
    When executing query:
      """
      RETURN toUpper(null) AS a, size(null) AS b, toInteger(null) AS c,
             trim(null) AS d, abs(null) AS e
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    | e    |
      | null | null | null | null | null |

  Scenario: substring with start and length
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 1) AS a, substring('hello', 1, 3) AS b,
             substring('hello', 0, 0) AS c
      """
    Then the result should be, in any order:
      | a      | b     | c  |
      | 'ello' | 'ell' | '' |

  Scenario: substring beyond end is empty
    Given an empty graph
    When executing query:
      """
      RETURN substring('ab', 5) AS a, substring('ab', 1, 99) AS b
      """
    Then the result should be, in any order:
      | a  | b   |
      | '' | 'b' |

  Scenario: left and right
    Given an empty graph
    When executing query:
      """
      RETURN left('hello', 2) AS l, right('hello', 2) AS r,
             left('ab', 99) AS lo, right('ab', 99) AS ro
      """
    Then the result should be, in any order:
      | l    | r    | lo   | ro   |
      | 'he' | 'lo' | 'ab' | 'ab' |

  Scenario: replace all occurrences
    Given an empty graph
    When executing query:
      """
      RETURN replace('aXbXc', 'X', '-') AS a, replace('abc', 'z', 'q') AS b,
             replace('aaa', 'aa', 'b') AS c
      """
    Then the result should be, in any order:
      | a       | b     | c    |
      | 'a-b-c' | 'abc' | 'ba' |

  Scenario: split on a delimiter
    Given an empty graph
    When executing query:
      """
      RETURN split('a,b,c', ',') AS a, split('abc', 'x') AS b
      """
    Then the result should be, in any order:
      | a               | b       |
      | ['a', 'b', 'c'] | ['abc'] |

  Scenario: trim variants
    Given an empty graph
    When executing query:
      """
      RETURN trim('  x  ') AS t, lTrim('  x  ') AS l, rTrim('  x  ') AS r
      """
    Then the result should be, in any order:
      | t   | l      | r      |
      | 'x' | 'x  '  | '  x'  |

  Scenario: toUpper toLower
    Given an empty graph
    When executing query:
      """
      RETURN toUpper('MiXeD') AS u, toLower('MiXeD') AS l
      """
    Then the result should be, in any order:
      | u       | l       |
      | 'MIXED' | 'mixed' |

  Scenario: reverse of a string
    Given an empty graph
    When executing query:
      """
      RETURN reverse('abc') AS r, reverse('') AS e
      """
    Then the result should be, in any order:
      | r     | e  |
      | 'cba' | '' |

  Scenario: size of a string
    Given an empty graph
    When executing query:
      """
      RETURN size('hello') AS a, size('') AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 5 | 0 |

  Scenario: abs sign floor ceil round
    Given an empty graph
    When executing query:
      """
      RETURN abs(-2) AS a, sign(-9) AS s, sign(0) AS z,
             floor(1.7) AS f, ceil(1.2) AS c, round(1.5) AS r
      """
    Then the result should be, in any order:
      | a | s  | z | f   | c   | r   |
      | 2 | -1 | 0 | 1.0 | 2.0 | 2.0 |

  Scenario: sqrt and power
    Given an empty graph
    When executing query:
      """
      RETURN sqrt(9.0) AS s, 2 ^ 10 AS p
      """
    Then the result should be, in any order:
      | s   | p      |
      | 3.0 | 1024.0 |

  Scenario: integer division truncates and float division does not
    Given an empty graph
    When executing query:
      """
      RETURN 7 / 2 AS intdiv, 7.0 / 2 AS floatdiv, 7 % 3 AS mod
      """
    Then the result should be, in any order:
      | intdiv | floatdiv | mod |
      | 3      | 3.5      | 1   |

  Scenario: coalesce returns first non-null
    Given an empty graph
    When executing query:
      """
      RETURN coalesce(null, null, 3, 4) AS a, coalesce(null, null) AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 3 | null |

  Scenario: keys of a map
    Given an empty graph
    When executing query:
      """
      RETURN keys({b: 1, a: 2}) AS ks
      """
    Then the result should be, in any order:
      | ks         |
      | ['a', 'b'] |

  Scenario: keys of a node
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x', age: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN keys(p) AS ks
      """
    Then the result should be, in any order:
      | ks              |
      | ['age', 'name'] |

  Scenario: properties of a node
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x', age: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN properties(p).name AS name, properties(p).age AS age
      """
    Then the result should be, in any order:
      | name | age |
      | 'x'  | 1   |

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

  Scenario: nested function composition
    Given an empty graph
    When executing query:
      """
      RETURN toUpper(left(trim('  hello  '), 2)) AS x
      """
    Then the result should be, in any order:
      | x    |
      | 'HE' |

  Scenario: split then index then size
    Given an empty graph
    When executing query:
      """
      RETURN split('a:b:c', ':')[1] AS mid, size(split('a:b:c', ':')) AS n
      """
    Then the result should be, in any order:
      | mid | n |
      | 'b' | 3 |
