Feature: List operators — null corners and boundary matrix

  Scenario: head last tail of empty list
    Given an empty graph
    When executing query:
      """
      RETURN head([]) AS h, last([]) AS l, tail([]) AS t
      """
    Then the result should be, in any order:
      | h    | l    | t  |
      | null | null | [] |

  Scenario: head last tail of null
    Given an empty graph
    When executing query:
      """
      RETURN head(null) AS h, last(null) AS l, tail(null) AS t
      """
    Then the result should be, in any order:
      | h    | l    | t    |
      | null | null | null |

  Scenario: size of null vs empty
    Given an empty graph
    When executing query:
      """
      RETURN size(null) AS sn, size([]) AS se
      """
    Then the result should be, in any order:
      | sn   | se |
      | null | 0  |

  Scenario: reverse of null and empty
    Given an empty graph
    When executing query:
      """
      RETURN reverse(null) AS rn, reverse([]) AS re
      """
    Then the result should be, in any order:
      | rn   | re |
      | null | [] |

  Scenario: list comprehension over null source is null
    Given an empty graph
    When executing query:
      """
      RETURN [x IN null | x * 2] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: list comprehension filter keeps 3VL semantics
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, null, 3] WHERE x > 1 | x] AS v
      """
    Then the result should be, in any order:
      | v   |
      | [3] |

  Scenario: comprehension projecting nulls keeps them
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, 2] | null] AS v
      """
    Then the result should be, in any order:
      | v            |
      | [null, null] |

  Scenario: index by null is null
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][null] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: index out of range is null both directions
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2][5] AS a, [1, 2][-5] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: negative index counts from the end
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][-1] AS a, [1, 2, 3][-3] AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 3 | 1 |

  Scenario: slice with null bound is null
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][null..2] AS a, [1, 2, 3][0..null] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: slice beyond bounds clamps
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][1..99] AS a, [1, 2, 3][-99..1] AS b
      """
    Then the result should be, in any order:
      | a      | b   |
      | [2, 3] | [1] |

  Scenario: inverted slice is empty
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][2..1] AS v
      """
    Then the result should be, in any order:
      | v  |
      | [] |

  Scenario: concatenating null to a list nulls the result
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + null AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: appending an element via plus
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + 3 AS v
      """
    Then the result should be, in any order:
      | v         |
      | [1, 2, 3] |

  Scenario: empty list concat keeps the other side
    Given an empty graph
    When executing query:
      """
      RETURN [] + [1] AS a, [1] + [] AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | [1] | [1] |

  Scenario: IN over list containing null is unknown when no match
    Given an empty graph
    When executing query:
      """
      RETURN 3 IN [1, null] AS a, 1 IN [1, null] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | true |

  Scenario: null IN empty list is false
    Given an empty graph
    When executing query:
      """
      RETURN null IN [] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: null IN non-empty list is null
    Given an empty graph
    When executing query:
      """
      RETURN null IN [1, 2] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: all over list with null element is null when rest pass
    Given an empty graph
    When executing query:
      """
      RETURN all(x IN [2, null, 3] WHERE x > 1) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: all is false when any element fails regardless of nulls
    Given an empty graph
    When executing query:
      """
      RETURN all(x IN [0, null, 3] WHERE x > 1) AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: any true short-circuits nulls
    Given an empty graph
    When executing query:
      """
      RETURN any(x IN [null, 5] WHERE x > 1) AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |

  Scenario: any over only-null predicate values is null
    Given an empty graph
    When executing query:
      """
      RETURN any(x IN [null, null] WHERE x > 1) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: none over empty list is true
    Given an empty graph
    When executing query:
      """
      RETURN none(x IN [] WHERE x > 0) AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |

  Scenario: single with one true and one null is null
    Given an empty graph
    When executing query:
      """
      RETURN single(x IN [2, null] WHERE x > 1) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: single with two passing elements is false
    Given an empty graph
    When executing query:
      """
      RETURN single(x IN [2, 3] WHERE x > 1) AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: reduce over null list is null
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN null | acc + x) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: reduce over empty list returns the initial value
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 42, x IN [] | acc + x) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: reduce with null element nulls the accumulator
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, null, 2] | acc + x) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: range with negative step descends
    Given an empty graph
    When executing query:
      """
      RETURN range(5, 1, -2) AS v
      """
    Then the result should be, in any order:
      | v         |
      | [5, 3, 1] |

  Scenario: range start equals end yields single element
    Given an empty graph
    When executing query:
      """
      RETURN range(3, 3) AS v
      """
    Then the result should be, in any order:
      | v   |
      | [3] |

  Scenario: empty-range orientations yield empty lists
    Given an empty graph
    When executing query:
      """
      RETURN range(3, 1) AS a, range(1, 3, -1) AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | [] | [] |

  Scenario: UNWIND null produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND null AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND empty list produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [] AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND list with nulls keeps null rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | 2    |
      | null |

  Scenario: nested list equality with null holes is null
    Given an empty graph
    When executing query:
      """
      RETURN [1, null] = [1, null] AS a, [1, null] = [2, null] AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | null | false |

  Scenario: list equality with size mismatch is false even with nulls
    Given an empty graph
    When executing query:
      """
      RETURN [1, null] = [1] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: keys of null map is null
    Given an empty graph
    When executing query:
      """
      RETURN keys(null) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: collect skips nulls
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN collect(x) AS v
      """
    Then the result should be, in any order:
      | v      |
      | [1, 2] |

  Scenario: collect over no rows is empty list
    Given an empty graph
    When executing query:
      """
      UNWIND [] AS x RETURN collect(x) AS v
      """
    Then the result should be, in any order:
      | v  |
      | [] |
