Feature: Lists, UNWIND, comprehensions (TCK expressions/list corners)

  Scenario: UNWIND an empty list produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [] AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND null produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND null AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND keeps null elements
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x
      """
    Then the result should be, in any order:
      | x    |
      | 1    |
      | null |
      | 2    |

  Scenario: Nested UNWIND is a cross product per element
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x
      UNWIND ['a', 'b'] AS y
      RETURN x, y ORDER BY x, y
      """
    Then the result should be, in order:
      | x | y   |
      | 1 | 'a' |
      | 1 | 'b' |
      | 2 | 'a' |
      | 2 | 'b' |

  Scenario: List indexing is zero-based with negative wrap
    Given an empty graph
    When executing query:
      """
      WITH [10, 20, 30] AS l
      RETURN l[0] AS first, l[-1] AS last, l[5] AS oob
      """
    Then the result should be, in any order:
      | first | last | oob  |
      | 10    | 30   | null |

  Scenario: List slicing
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS l
      RETURN l[1..3] AS mid, l[..2] AS head, l[3..] AS tail
      """
    Then the result should be, in any order:
      | mid    | head   | tail   |
      | [2, 3] | [1, 2] | [4, 5] |

  Scenario: range with step
    Given an empty graph
    When executing query:
      """
      RETURN range(1, 10, 3) AS r, range(3, 1) AS down
      """
    Then the result should be, in any order:
      | r             | down |
      | [1, 4, 7, 10] | []   |

  Scenario: List comprehension with filter and map
    Given an empty graph
    When executing query:
      """
      RETURN [x IN range(1, 5) WHERE x % 2 = 1 | x * 10] AS odds
      """
    Then the result should be, in any order:
      | odds         |
      | [10, 30, 50] |

  Scenario: reduce accumulates in order
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3] | acc * 10 + x) AS r
      """
    Then the result should be, in any order:
      | r   |
      | 123 |

  Scenario: Quantifiers all any none single
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN all(x IN l WHERE x > 0) AS a,
             any(x IN l WHERE x > 2) AS b,
             none(x IN l WHERE x > 5) AS c,
             single(x IN l WHERE x = 2) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |

  Scenario: Quantifiers over an empty list
    Given an empty graph
    When executing query:
      """
      WITH [] AS l
      RETURN all(x IN l WHERE x > 0) AS a, any(x IN l WHERE x > 0) AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: head last tail size reverse
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN head(l) AS h, last(l) AS la, tail(l) AS t, size(l) AS s,
             reverse(l) AS r
      """
    Then the result should be, in any order:
      | h | la | t      | s | r         |
      | 1 | 3  | [2, 3] | 3 | [3, 2, 1] |

  Scenario: head and last of empty list are null
    Given an empty graph
    When executing query:
      """
      WITH [] AS l
      RETURN head(l) AS h, last(l) AS la
      """
    Then the result should be, in any order:
      | h    | la   |
      | null | null |

  Scenario: List equality is element-wise
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] = [1, 2] AS eq, [1, 2] = [2, 1] AS ne
      """
    Then the result should be, in any order:
      | eq   | ne    |
      | true | false |

  Scenario: Heterogeneous nested list equality
    Given an empty graph
    When executing query:
      """
      RETURN [1, [2]] = [1, [2]] AS nested
      """
    Then the result should be, in any order:
      | nested |
      | true   |

  Scenario: Map access and keys
    Given an empty graph
    When executing query:
      """
      WITH {a: 1, b: 'two'} AS m
      RETURN m.a AS a, m['b'] AS b, m.zzz AS missing
      """
    Then the result should be, in any order:
      | a | b     | missing |
      | 1 | 'two' | null    |

  Scenario: UNWIND then aggregate round trip
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x
      RETURN collect(x) AS sorted, sum(x) AS total
      """
    Then the result should be, in any order:
      | sorted    | total |
      | [1, 2, 3] | 6     |

  Scenario: split and join round trip
    Given an empty graph
    When executing query:
      """
      RETURN split('a,b,c', ',') AS parts
      """
    Then the result should be, in any order:
      | parts           |
      | ['a', 'b', 'c'] |

  Scenario: IN over list of lists
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] IN [[1, 2], [3]] AS yes
      """
    Then the result should be, in any order:
      | yes  |
      | true |

  Scenario: Pattern comprehension collects per row
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:Q {v: 1}), (c:Q {v: 2})
      CREATE (a)-[:T]->(b), (a)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN size([(p)-[:T]->(q) | q.v]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: Heterogeneous literal list indexing decodes the plain value
    Given an empty graph
    When executing query:
      """
      RETURN [1, 'a'][0] AS i, [1, 'a'][1] AS s, [1, 'a'][-1] AS neg,
             [1, 'a'][9] AS oob
      """
    Then the result should be, in any order:
      | i | s   | neg | oob  |
      | 1 | 'a' | 'a' | null |

  Scenario: Heterogeneous list inequality and size
    Given an empty graph
    When executing query:
      """
      RETURN [1, 'a'] <> [1, 'b'] AS ne, size([1, [2], 'x']) AS sz,
             [1, [2]] IN [[1, [2]], [3]] AS haystack
      """
    Then the result should be, in any order:
      | ne   | sz | haystack |
      | true | 3  | true     |
