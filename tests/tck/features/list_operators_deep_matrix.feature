Feature: List operator deep matrix (indexing, slices, nesting, equality)

  Scenario: negative index counts from the end
    Given an empty graph
    When executing query:
      """
      WITH [10, 20, 30] AS l
      RETURN l[-1] AS last, l[-3] AS first
      """
    Then the result should be, in any order:
      | last | first |
      | 30   | 10    |

  Scenario: index out of range is null
    Given an empty graph
    When executing query:
      """
      WITH [1, 2] AS l
      RETURN l[5] AS over, l[-5] AS under
      """
    Then the result should be, in any order:
      | over | under |
      | null | null  |

  Scenario: slice with negative bounds
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS l
      RETURN l[-3..-1] AS r
      """
    Then the result should be, in any order:
      | r      |
      | [3, 4] |

  Scenario: slice clamps to list bounds
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN l[1..10] AS r, l[-10..2] AS s
      """
    Then the result should be, in any order:
      | r      | s      |
      | [2, 3] | [1, 2] |

  Scenario: slice with crossed bounds is empty
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN l[2..1] AS r
      """
    Then the result should be, in any order:
      | r  |
      | [] |

  Scenario: open-ended slices
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3, 4] AS l
      RETURN l[2..] AS tail_part, l[..2] AS head_part
      """
    Then the result should be, in any order:
      | tail_part | head_part |
      | [3, 4]    | [1, 2]    |

  Scenario: slice of null and null bounds
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l, null AS n
      RETURN n[0..1] AS a, l[null..2] IS NULL AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | true |

  Scenario: head last tail on lists
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN head(l) AS h, last(l) AS t, tail(l) AS rest
      """
    Then the result should be, in any order:
      | h | t | rest   |
      | 1 | 3 | [2, 3] |

  Scenario: head and last of empty list are null
    Given an empty graph
    When executing query:
      """
      WITH [] AS l
      RETURN head(l) AS h, last(l) AS t, tail(l) AS rest
      """
    Then the result should be, in any order:
      | h    | t    | rest |
      | null | null | []   |

  Scenario: reverse a list
    Given an empty graph
    When executing query:
      """
      RETURN reverse([1, 2, 3]) AS r
      """
    Then the result should be, in any order:
      | r         |
      | [3, 2, 1] |

  Scenario: list concatenation with plus
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS a, [] + [1] AS b, [1] + [] AS c
      """
    Then the result should be, in any order:
      | a         | b   | c   |
      | [1, 2, 3] | [1] | [1] |

  Scenario: appending a scalar to a list
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + 3 AS r
      """
    Then the result should be, in any order:
      | r         |
      | [1, 2, 3] |

  Scenario: nested list indexing chains
    Given an empty graph
    When executing query:
      """
      WITH [[1, 2], [3, 4]] AS m
      RETURN m[1][0] AS r
      """
    Then the result should be, in any order:
      | r |
      | 3 |

  Scenario: nested list membership
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] IN [[1, 2], [3]] AS yes, [2, 1] IN [[1, 2], [3]] AS no
      """
    Then the result should be, in any order:
      | yes  | no    |
      | true | false |

  Scenario: list equality is element-wise
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] = [1, 2] AS eq, [1, 2] = [1, 3] AS ne,
             [1, 2] = [1, 2, 3] AS diff_len
      """
    Then the result should be, in any order:
      | eq   | ne    | diff_len |
      | true | false | false    |

  Scenario: list equality with null holes is unknown when undecided
    Given an empty graph
    When executing query:
      """
      RETURN ([1, null] = [1, 2]) IS NULL AS undecided,
             [1, null] = [2, 2] AS decided_false
      """
    Then the result should be, in any order:
      | undecided | decided_false |
      | true      | false         |

  Scenario: transform with filter composed
    Given an empty graph
    When executing query:
      """
      RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * x] AS squares
      """
    Then the result should be, in any order:
      | squares     |
      | [4, 16, 36] |

  Scenario: comprehension without projection keeps elements
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [3, 1, 2] WHERE x > 1] AS r
      """
    Then the result should be, in any order:
      | r      |
      | [3, 2] |

  Scenario: comprehension without filter maps all
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, 2] | x + 10] AS r
      """
    Then the result should be, in any order:
      | r        |
      | [11, 12] |

  Scenario: nested comprehension flattens via reduce
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = [], l IN [[1, 2], [3]] | acc + l) AS flat
      """
    Then the result should be, in any order:
      | flat      |
      | [1, 2, 3] |

  Scenario: reduce computes a running product
    Given an empty graph
    When executing query:
      """
      RETURN reduce(p = 1, x IN [2, 3, 4] | p * x) AS product
      """
    Then the result should be, in any order:
      | product |
      | 24      |

  Scenario: reduce over an empty list returns the initializer
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 'seed', x IN [] | acc + x) AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'seed' |

  Scenario: size of nested lists counts the outer level
    Given an empty graph
    When executing query:
      """
      RETURN size([[1, 2], [3], []]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: keys of a map literal
    Given an empty graph
    When executing query:
      """
      WITH {b: 1, a: 2, c: 3} AS m
      UNWIND keys(m) AS k
      RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |
      | 'c' |

  Scenario: dynamic map access by key expression
    Given an empty graph
    When executing query:
      """
      WITH {one: 1, two: 2} AS m, 'two' AS k
      RETURN m[k] AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: map access of a missing key is null
    Given an empty graph
    When executing query:
      """
      WITH {a: 1} AS m
      RETURN m.zzz AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: range as a value with step and membership
    Given an empty graph
    When executing query:
      """
      WITH range(0, 10, 5) AS r
      RETURN r, 5 IN r AS has5, 7 IN r AS has7
      """
    Then the result should be, in any order:
      | r          | has5 | has7  |
      | [0, 5, 10] | true | false |

  Scenario: list of mixed values keeps order through collect and unwind
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x
      WITH collect(x) AS xs
      RETURN xs
      """
    Then the result should be, in any order:
      | xs        |
      | [1, 2, 3] |

  Scenario: indexing the result of a function call
    Given an empty graph
    When executing query:
      """
      RETURN split('a-b-c', '-')[2] AS r, tail([1, 2, 3])[0] AS s
      """
    Then the result should be, in any order:
      | r   | s |
      | 'c' | 2 |

  Scenario: singleton and empty comprehension edge cases
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [] | x] AS empty, [x IN [5] | x * 2] AS one
      """
    Then the result should be, in any order:
      | empty | one  |
      | []    | [10] |
