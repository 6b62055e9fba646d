Feature: OPTIONAL MATCH interacting with aggregation and scope

  Scenario: count of an optional variable counts only matches
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'}), (:U {name: 'b'})
      """
    And having executed:
      """
      MATCH (u:U {name: 'a'}) CREATE (u)-[:OWNS]->(:Item {v: 1})
      """
    When executing query:
      """
      MATCH (u:U)
      OPTIONAL MATCH (u)-[:OWNS]->(i:Item)
      RETURN u.name AS name, count(i) AS items
      """
    Then the result should be, in any order:
      | name | items |
      | 'a'  | 1     |
      | 'b'  | 0     |

  Scenario: collect over an empty optional side is an empty list
    Given an empty graph
    And having executed:
      """
      CREATE (:V {name: 'solo'})
      """
    When executing query:
      """
      MATCH (v:V)
      OPTIONAL MATCH (v)-[:REL]->(x)
      RETURN v.name AS name, collect(x) AS xs
      """
    Then the result should be, in any order:
      | name   | xs |
      | 'solo' | [] |

  Scenario: sum over the optional side treats missing as zero rows
    Given an empty graph
    And having executed:
      """
      CREATE (:W {name: 'w1'}), (:W {name: 'w2'})
      """
    And having executed:
      """
      MATCH (w:W {name: 'w1'})
      CREATE (w)-[:HAS]->(:Val {v: 5}), (w)-[:HAS]->(:Val {v: 7})
      """
    When executing query:
      """
      MATCH (w:W)
      OPTIONAL MATCH (w)-[:HAS]->(x:Val)
      RETURN w.name AS name, sum(x.v) AS total
      """
    Then the result should be, in any order:
      | name | total |
      | 'w1' | 12    |
      | 'w2' | 0     |

  Scenario: Property of an unmatched optional node is null
    Given an empty graph
    And having executed:
      """
      CREATE (:Lone {name: 'x'})
      """
    When executing query:
      """
      MATCH (l:Lone)
      OPTIONAL MATCH (l)-[:R]->(m)
      RETURN l.name AS name, m.name AS mname, m IS NULL AS missing
      """
    Then the result should be, in any order:
      | name | mname | missing |
      | 'x'  | null  | true    |

  Scenario: Two chained OPTIONAL MATCH clauses both bind null
    Given an empty graph
    And having executed:
      """
      CREATE (:Root {name: 'r'})
      """
    When executing query:
      """
      MATCH (r:Root)
      OPTIONAL MATCH (r)-[:A]->(a)
      OPTIONAL MATCH (a)-[:B]->(b)
      RETURN r.name AS name, a IS NULL AS a_null, b IS NULL AS b_null
      """
    Then the result should be, in any order:
      | name | a_null | b_null |
      | 'r'  | true   | true   |

  Scenario: OPTIONAL MATCH on a nonexistent label still yields one row
    Given an empty graph
    And having executed:
      """
      CREATE (:Present {v: 1})
      """
    When executing query:
      """
      MATCH (p:Present)
      OPTIONAL MATCH (q:AbsentLabel)
      RETURN p.v AS v, q IS NULL AS q_null
      """
    Then the result should be, in any order:
      | v | q_null |
      | 1 | true   |

  Scenario: Standalone OPTIONAL MATCH with no match returns a single null row
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (n:Nothing)
      RETURN n IS NULL AS is_null
      """
    Then the result should be, in any order:
      | is_null |
      | true    |

  Scenario: WHERE after OPTIONAL MATCH filters nulls out when strict
    Given an empty graph
    And having executed:
      """
      CREATE (:M {name: 'm1'}), (:M {name: 'm2'})
      """
    And having executed:
      """
      MATCH (m:M {name: 'm1'}) CREATE (m)-[:T]->(:K {v: 3})
      """
    When executing query:
      """
      MATCH (m:M)
      OPTIONAL MATCH (m)-[:T]->(k:K)
      WITH m, k WHERE k.v > 1
      RETURN m.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'm1' |

  Scenario: Aggregate after optional keeps groups with only-null members
    Given an empty graph
    And having executed:
      """
      CREATE (:G {g: 'x'}), (:G {g: 'y'})
      """
    And having executed:
      """
      MATCH (g:G {g: 'x'}) CREATE (g)-[:E]->(:Leaf {v: 2})
      """
    When executing query:
      """
      MATCH (g:G)
      OPTIONAL MATCH (g)-[:E]->(l:Leaf)
      RETURN g.g AS grp, count(l) AS c, min(l.v) AS mn
      """
    Then the result should be, in any order:
      | grp | c | mn   |
      | 'x' | 1 | 2    |
      | 'y' | 0 | null |

  Scenario: OPTIONAL MATCH reusing a bound relationship variable pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'p'})-[:L {w: 1}]->(:Q {name: 'q'})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[r:L]->(q:Q)
      RETURN q.name AS qn, r.w AS w
      """
    Then the result should be, in any order:
      | qn  | w |
      | 'q' | 1 |

  Scenario: DISTINCT over mixed null and value rows from optional
    Given an empty graph
    And having executed:
      """
      CREATE (:H {h: 1}), (:H {h: 2}), (:H {h: 3})
      """
    And having executed:
      """
      MATCH (h:H) WHERE h.h < 3 CREATE (h)-[:S]->(:Tag {t: 'same'})
      """
    When executing query:
      """
      MATCH (h:H)
      OPTIONAL MATCH (h)-[:S]->(t:Tag)
      RETURN DISTINCT t.t AS tag
      """
    Then the result should be, in any order:
      | tag    |
      | 'same' |
      | null   |

  Scenario: avg over optional with no matches is null
    Given an empty graph
    And having executed:
      """
      CREATE (:Solo2 {name: 's'})
      """
    When executing query:
      """
      MATCH (s:Solo2)
      OPTIONAL MATCH (s)-[:N]->(v:NumHolder)
      RETURN avg(v.num) AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |
