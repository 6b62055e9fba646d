Feature: List indexing and slicing corners (TCK List expressions; reference
  translator list index/slice emission)

  Scenario: Positive index
    Given an empty graph
    When executing query:
      """
      RETURN [10, 20, 30][1] AS x
      """
    Then the result should be, in any order:
      | x  |
      | 20 |

  Scenario: Negative index counts from the end
    Given an empty graph
    When executing query:
      """
      RETURN [10, 20, 30][-1] AS a, [10, 20, 30][-3] AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | 30 | 10 |

  Scenario: Out-of-bounds index is null
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2][5] AS a, [1, 2][-5] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: Null index is null
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2][null] AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |

  Scenario: Index into null list is null
    Given an empty graph
    When executing query:
      """
      RETURN null[0] AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |

  Scenario: Basic slice
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3, 4][1..3] AS s
      """
    Then the result should be, in any order:
      | s      |
      | [2, 3] |

  Scenario: Open-ended slices
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3, 4][2..] AS a, [1, 2, 3, 4][..2] AS b
      """
    Then the result should be, in any order:
      | a      | b      |
      | [3, 4] | [1, 2] |

  Scenario: Negative slice bounds
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3, 4][-2..] AS a, [1, 2, 3, 4][..-1] AS b
      """
    Then the result should be, in any order:
      | a      | b         |
      | [3, 4] | [1, 2, 3] |

  Scenario: Slice beyond bounds clamps
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2][0..10] AS a, [1, 2][5..9] AS b
      """
    Then the result should be, in any order:
      | a      | b  |
      | [1, 2] | [] |

  Scenario: Empty slice when start >= end
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][2..1] AS a, [1, 2, 3][1..1] AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | [] | [] |

  Scenario: Slice with null bound is null
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2, 3][null..2] AS a, [1, 2, 3][1..null] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: head last tail size on lists
    Given an empty graph
    When executing query:
      """
      RETURN head([1, 2, 3]) AS h, last([1, 2, 3]) AS l,
             tail([1, 2, 3]) AS t, size([1, 2, 3]) AS s
      """
    Then the result should be, in any order:
      | h | l | t      | s |
      | 1 | 3 | [2, 3] | 3 |

  Scenario: head last tail of empty list
    Given an empty graph
    When executing query:
      """
      RETURN head([]) AS h, last([]) AS l, tail([]) AS t, size([]) AS s
      """
    Then the result should be, in any order:
      | h    | l    | t  | s |
      | null | null | [] | 0 |

  Scenario: reverse of a list
    Given an empty graph
    When executing query:
      """
      RETURN reverse([1, 2, 3]) AS r
      """
    Then the result should be, in any order:
      | r         |
      | [3, 2, 1] |

  Scenario: range with step
    Given an empty graph
    When executing query:
      """
      RETURN range(0, 10, 3) AS a, range(5, 1, -2) AS b, range(1, 1) AS c
      """
    Then the result should be, in any order:
      | a             | b         | c   |
      | [0, 3, 6, 9]  | [5, 3, 1] | [1] |

  Scenario: range descending without step is empty
    Given an empty graph
    When executing query:
      """
      RETURN range(3, 1) AS r
      """
    Then the result should be, in any order:
      | r  |
      | [] |

  Scenario: List concatenation with +
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS a, [] + [1] AS b, [1] + [] AS c
      """
    Then the result should be, in any order:
      | a         | b   | c   |
      | [1, 2, 3] | [1] | [1] |

  Scenario: Appending a scalar to a list with +
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + 3 AS a
      """
    Then the result should be, in any order:
      | a         |
      | [1, 2, 3] |

  Scenario: Slice of a stored list property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {xs: [10, 20, 30, 40]})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.xs[1..3] AS mid, n.xs[0] AS first
      """
    Then the result should be, in any order:
      | mid      | first |
      | [20, 30] | 10    |

  Scenario: Index expression computed from variables
    Given an empty graph
    When executing query:
      """
      UNWIND [0, 1, 2] AS i RETURN [9, 8, 7][i] AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 7 |
      | 8 |
      | 9 |
